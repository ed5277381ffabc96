"""One-shot detection service core (framework-agnostic).

Port of the reference FastAPI app's handler logic (app.py:48-103) with the
model HOISTED out of the request path (the reference rebuilds the whole model
per request, app.py:50-67 — flagged in SURVEY.md §3.5). The FastAPI wrapper
lives in os2d_tpu/api/app.py and imports this.
"""

from __future__ import annotations

import base64
from io import BytesIO
from typing import List, Optional

import numpy as np
from PIL import Image

import jax.numpy as jnp

from ..data.dataloader import image_to_normalized_array
from ..engine.decode import decode_pyramid
from ..models import Os2dConfig, Os2dModel
from ..models.head import ClassHead
from ..structures.feature_map import FeatureMapSize, exact_resize_area

TARGET_IMAGE_SIZE = 1500  # longer side (reference app.py:74-76)
TARGET_QUERY_AREA_SIDE = 240
SCORE_THRESHOLD = 0.45
MAX_DETECTIONS = 30


def decode_base64_to_image(b64: str) -> Image.Image:
    img = Image.open(BytesIO(base64.b64decode(b64)))
    if img.mode != "RGB":
        img = img.convert("RGB")
    return img


class DetectionService:
    """Holds the model + params; thread-safe for read-only inference.

    Serving features beyond the reference handler (app.py:48-103):
      - pyramid_scales: multiscale input pyramid (the reference app serves a
        single scale even though its eval engine is multiscale);
      - class_image_augmentation: test-time query augmentation
        ("rotation90" | "horflip" | "horflip_rotation90"), same view merge
        as engine/evaluate.py;
      - detect_batch: N images x one query set in ONE backbone+head dispatch
        per scale (shared class head, common padded canvas).
    """

    def __init__(self, model: Os2dModel, params, score_threshold=SCORE_THRESHOLD,
                 max_detections=MAX_DETECTIONS, pyramid_scales=(1.0,),
                 class_image_augmentation: str = ""):
        self.model = model
        self.params = params
        self.score_threshold = score_threshold
        self.max_detections = max_detections
        self.pyramid_scales = tuple(pyramid_scales)
        self.class_image_augmentation = class_image_augmentation
        self.img_normalization = {
            "mean": model.config.normalization_mean,
            "std": model.config.normalization_std,
        }

    def _prepare_input(self, image: Image.Image, scale: float):
        w, h = image.size
        ratio = TARGET_IMAGE_SIZE * scale / max(w, h)
        new_size = (int(w * ratio), int(h * ratio))
        resized = image.resize(new_size, Image.BILINEAR)
        arr = image_to_normalized_array(resized, self.img_normalization)
        return arr, FeatureMapSize(w=new_size[0], h=new_size[1])

    def _prepare_query(self, query: Image.Image):
        w, h = query.size
        new = exact_resize_area(w=w, h=h, target_area_side=TARGET_QUERY_AREA_SIDE)
        resized = query.resize((new.w, new.h), Image.BILINEAR)
        return image_to_normalized_array(resized, self.img_normalization)

    def _build_class_head(self, queries: List[Image.Image]):
        """Prepared query arrays -> (ClassHead, num_views) with optional TTA."""
        from ..engine.evaluate import augment_class_images

        query_arrays = [self._prepare_query(q) for q in queries]
        views, num_views = augment_class_images(
            query_arrays, self.class_image_augmentation
        )
        class_head = self.model.build_class_head_from_images(
            self.params, [jnp.asarray(v) for v in views]
        )
        return class_head, num_views

    def _merge_views(self, loc_pyramid, cls_pyramid, img_sizes, inv_scales,
                     num_views):
        """TTA views of one query occupy contiguous rows; merge them for joint
        per-query NMS by treating each view as an extra pyramid level (same
        trick as engine/evaluate.py decode_image)."""
        if num_views <= 1:
            return loc_pyramid, cls_pyramid, img_sizes, inv_scales
        loc_pyramid = [l[v::num_views] for l in loc_pyramid for v in range(num_views)]
        cls_pyramid = [c[v::num_views] for c in cls_pyramid for v in range(num_views)]
        img_sizes = [s for s in img_sizes for _ in range(num_views)]
        inv_scales = [s for s in inv_scales for _ in range(num_views)]
        return loc_pyramid, cls_pyramid, img_sizes, inv_scales

    def _decode_to_response(self, loc_pyramid, cls_pyramid, img_sizes,
                            inv_scales, num_views, orig_w, orig_h):
        loc_pyramid, cls_pyramid, img_sizes, inv_scales = self._merge_views(
            loc_pyramid, cls_pyramid, img_sizes, inv_scales, num_views
        )
        det = decode_pyramid(
            loc_pyramid, cls_pyramid, img_sizes, inv_scales,
            nms_iou_threshold=0.3, score_threshold=float("-inf"),
            pre_top_k=1024, top_k=max(self.max_detections, 64),
        )
        boxes = np.asarray(det["boxes"])
        scores = np.asarray(det["scores"])
        valid = np.asarray(det["valid"])

        flat = []
        for row in range(boxes.shape[0]):
            m = valid[row] & (scores[row] > self.score_threshold)
            for b, s in zip(boxes[row][m], scores[row][m]):
                # drop boxes whose center left the original image (batched
                # canvases have padding to the right/bottom)
                cx = 0.5 * (float(b[0]) + float(b[2]))
                cy = 0.5 * (float(b[1]) + float(b[3]))
                if 0 <= cx <= orig_w and 0 <= cy <= orig_h:
                    flat.append((float(s), b))
        flat.sort(key=lambda x: -x[0])
        flat = flat[: self.max_detections]

        return {
            "scores": [s for s, _ in flat],
            "bboxes": [
                [
                    float(b[0]) / orig_w,
                    float(b[1]) / orig_h,
                    float(b[2]) / orig_w,
                    float(b[3]) / orig_h,
                ]
                for _, b in flat
            ],
        }

    def detect(self, image: Image.Image, queries: List[Image.Image]):
        """Returns {"scores": [...], "bboxes": [[lx, ty, rx, by], ...]} with
        RELATIVE coordinates (reference app.py:83-103)."""
        orig_w, orig_h = image.size
        class_head, num_views = self._build_class_head(queries)

        loc_pyramid, cls_pyramid, img_sizes, inv_scales = [], [], [], []
        for scale in self.pyramid_scales:
            arr, img_size = self._prepare_input(image, scale)
            fm = self.model.extract_features(self.params, jnp.asarray(arr[None]))
            out = self.model.apply_head(self.params, fm, class_head,
                                        train_mode=False)
            loc_pyramid.append(out["loc"][0])
            cls_pyramid.append(out["cls"][0])
            img_sizes.append(img_size)
            inv_scales.append((orig_w / img_size.w, orig_h / img_size.h))

        return self._decode_to_response(
            loc_pyramid, cls_pyramid, img_sizes, inv_scales, num_views,
            orig_w, orig_h,
        )

    def detect_batch(self, images: List[Image.Image],
                     queries: List[Image.Image]):
        """N images against ONE query set, batched onto a shared canvas.

        All images of a batch are resized (longer side -> TARGET*scale) and
        pasted top-left onto a common [B, T, T, 3] canvas (zeros = dataset
        mean after normalization), so each pyramid scale is ONE backbone+head
        dispatch for the whole batch — the production serving shape: a fixed
        catalog of queries against a stream of images. Returns a list of
        per-image {"scores", "bboxes"} responses.
        """
        if not images:
            return []
        class_head, num_views = self._build_class_head(queries)

        per_image = [
            {"loc": [], "cls": [], "sizes": [], "scales": []} for _ in images
        ]
        for scale in self.pyramid_scales:
            canvas_side = int(round(TARGET_IMAGE_SIZE * scale))
            batch = np.zeros(
                (len(images), canvas_side, canvas_side, 3), np.float32
            )
            resized_sizes = []
            for i, image in enumerate(images):
                w, h = image.size
                ratio = canvas_side / max(w, h)
                new_size = (
                    max(1, int(w * ratio)), max(1, int(h * ratio))
                )
                resized = image.resize(new_size, Image.BILINEAR)
                arr = image_to_normalized_array(resized, self.img_normalization)
                batch[i, : arr.shape[0], : arr.shape[1]] = arr
                resized_sizes.append(new_size)
            fm = self.model.extract_features(self.params, jnp.asarray(batch))
            out = self.model.apply_head(self.params, fm, class_head,
                                        train_mode=False)
            for i, image in enumerate(images):
                orig_w, orig_h = image.size
                rw, rh = resized_sizes[i]
                per_image[i]["loc"].append(out["loc"][i])
                per_image[i]["cls"].append(out["cls"][i])
                per_image[i]["sizes"].append(
                    FeatureMapSize(w=canvas_side, h=canvas_side)
                )
                per_image[i]["scales"].append((orig_w / rw, orig_h / rh))

        return [
            self._decode_to_response(
                acc["loc"], acc["cls"], acc["sizes"], acc["scales"],
                num_views, image.size[0], image.size[1],
            )
            for image, acc in zip(images, per_image)
        ]

    def queries_signature(self, queries: List[Image.Image]) -> tuple:
        """Cheap identity key for a query set (dynamic batching groups only
        requests that share the exact same catalog)."""
        import hashlib

        sig = []
        for q in queries:
            h = hashlib.sha1(q.tobytes()).hexdigest()[:16]
            sig.append((q.size, q.mode, h))
        return tuple(sig)

    def detect_from_request(self, payload: dict):
        """Request schema of the reference (app.py:48):
        {"image": {"content": b64}, "query": [{"content": b64}, ...]}"""
        image = decode_base64_to_image(payload["image"]["content"])
        queries = [decode_base64_to_image(q["content"]) for q in payload["query"]]
        return self.detect(image, queries)

    def detect_batch_from_request(self, payload: dict):
        """Batched schema: {"images": [{"content": b64}, ...],
        "query": [{"content": b64}, ...]} -> {"results": [per-image dicts]}."""
        images = [decode_base64_to_image(im["content"]) for im in payload["images"]]
        queries = [decode_base64_to_image(q["content"]) for q in payload["query"]]
        return {"results": self.detect_batch(images, queries)}


class DynamicBatcher:
    """Cross-request dynamic batching (the serving layer the reference lacks;
    ROADMAP serving item, round 2).

    Concurrent `detect()` calls whose query sets are identical (byte-wise)
    are grouped within a small window and dispatched as ONE
    `DetectionService.detect_batch` call — the production shape for a fixed
    catalog served against a stream of images. Requests with different query
    sets never share a batch.

    Thread-based and framework-agnostic: FastAPI handlers call `detect()`
    through a threadpool (see app.py); any other server can do the same.
    """

    def __init__(self, service: DetectionService, max_batch: int = 8,
                 max_wait_ms: float = 10.0):
        import collections
        import queue
        import threading

        self.service = service
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self._queue: "queue.Queue" = queue.Queue()
        # requests pulled out of a window whose catalog differed from the
        # window's head; served FIRST next round (FIFO — re-queuing them at
        # the tail would let a sustained majority-catalog stream starve them)
        self._deferred = collections.deque()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def detect(self, image: Image.Image, queries: List[Image.Image]) -> dict:
        """Blocking: enqueue and wait for the grouped result."""
        import threading

        if self._closed:
            raise RuntimeError("DynamicBatcher is closed")
        done = threading.Event()
        slot = {"result": None, "error": None}
        sig = self.service.queries_signature(queries)
        self._queue.put((sig, image, queries, slot, done))
        done.wait()
        if slot["error"] is not None:
            raise slot["error"]
        return slot["result"]

    def close(self):
        self._closed = True
        self._queue.put(None)  # wake the worker
        self._worker.join(timeout=30)
        # fail any requests the worker left behind instead of letting their
        # detect() calls block forever
        import queue

        err = RuntimeError("DynamicBatcher closed before request was served")
        leftovers = list(self._deferred)
        self._deferred.clear()
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                leftovers.append(item)
        for item in leftovers:
            item[3]["error"] = err
            item[4].set()

    # ---- worker ----
    def _run(self):
        import queue
        import time

        while not self._closed:
            if self._deferred:
                head = self._deferred.popleft()
            else:
                head = self._queue.get()
                if head is None:
                    continue
            group = [head]
            deadline = time.monotonic() + self.max_wait_s
            # absorb same-catalog deferred requests first, then gather from
            # the live queue until the window closes
            i = 0
            while i < len(self._deferred) and len(group) < self.max_batch:
                if self._deferred[i][0] == head[0]:
                    group.append(self._deferred[i])
                    del self._deferred[i]
                else:
                    i += 1
            while len(group) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    item = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if item is None:
                    continue
                if item[0] == head[0]:
                    group.append(item)
                else:
                    self._deferred.append(item)

            images = [g[1] for g in group]
            queries = group[0][2]
            try:
                # always the batched path, even for a group of one: detect()
                # (aspect-preserving resize) and detect_batch() (shared
                # square canvas) differ numerically at the margins, and a
                # request's result must not depend on concurrent traffic
                results = self.service.detect_batch(images, queries)
                for g, res in zip(group, results):
                    g[3]["result"] = res
                    g[4].set()
            except Exception as e:  # pragma: no cover - propagate to callers
                for g in group:
                    g[3]["error"] = e
                    g[4].set()

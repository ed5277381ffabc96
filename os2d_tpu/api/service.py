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
    """Holds the model + params; thread-safe for read-only inference."""

    def __init__(self, model: Os2dModel, params, score_threshold=SCORE_THRESHOLD,
                 max_detections=MAX_DETECTIONS, pyramid_scales=(1.0,)):
        self.model = model
        self.params = params
        self.score_threshold = score_threshold
        self.max_detections = max_detections
        self.pyramid_scales = tuple(pyramid_scales)
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

    def detect(self, image: Image.Image, queries: List[Image.Image]):
        """Returns {"scores": [...], "bboxes": [[lx, ty, rx, by], ...]} with
        RELATIVE coordinates (reference app.py:83-103)."""
        orig_w, orig_h = image.size

        query_arrays = [jnp.asarray(self._prepare_query(q)) for q in queries]
        class_head = self.model.build_class_head_from_images(
            self.params, query_arrays
        )

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

    def detect_from_request(self, payload: dict):
        """Request schema of the reference (app.py:48):
        {"image": {"content": b64}, "query": [{"content": b64}, ...]}"""
        image = decode_base64_to_image(payload["image"]["content"])
        queries = [decode_base64_to_image(q["content"]) for q in payload["query"]]
        return self.detect(image, queries)

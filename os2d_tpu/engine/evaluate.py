"""Evaluation engine: multiscale one-shot detection over a dataset.

TPU rebuild of os2d/engine/evaluate.py:21-371. Key structural changes vs the
reference:
  - class feature maps are precomputed ONCE as a [C_views, 15, 15, F] array
    (the reference rebuilds an Os2dHead per class with class_batch_size
    hard-coded to 1, evaluate.py:226-227);
  - the per-class Python loop over heads (the reference's eval hot loop,
    evaluate.py:323-331) becomes a vmapped/batched class axis, processed in
    chunks of cfg.tpu.eval_class_chunk to bound the correlation tensor;
  - decoding + NMS run on device with static shapes (engine/decode.py);
  - test-time class augmentation (rotation90 / horflip / horflip_rotation90,
    evaluate.py:241-269) adds contiguous view rows per class; views of the
    same class are merged before NMS by reshaping [C*V, A] -> [C, V*A], which
    reproduces the reference's joint per-class NMS over views.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.voc_eval import do_voc_evaluation
from ..models.head import ClassHead
from ..structures.feature_map import FeatureMapSize
from ..ops.pixel_format import PackedYuv420, decode_to_float_rgb, rgb_to_yuv420
from ..utils.upload import parallel_device_put
from .decode import decode_pyramid


def prescreen_margin(resample_precision: str, compute_dtype=jnp.float32):
    """Safety margin for the class prescreen: a class survives phase 1 iff
    its correlation ceiling > eval.nms_score_threshold - margin.

    The ceiling argument (detect_images_prescreened docstring) is exact in
    real arithmetic; the margin absorbs the worst-case ROUNDING difference
    between the phase-1 ceiling and the phase-2 resampled scores:

    - 'highest'/'high': fp32 resample matmuls; only einsum fusion-order
      ULP differences remain (measured <=1e-5) -> 1e-4.
    - 'default': the resample einsums round corr and the hat weights to
      bf16 (8-bit mantissa, round-off <=2^-9 relative each); for cosine
      scores |corr|<=1 the combined absolute error is <=~2^-8 ~= 4e-3.
    - 'int8': corr is quantized to 1/127 steps (~4e-3 absolute) on top of
      the fixed-point hat-weight rounding -> 1.5e-2 covers the measured
      1.0e-3 max error (BENCH_NOTES round 2) with ~10x headroom.
    - a bf16 model compute dtype additionally rounds the phase-1 einsum
      INPUTS (feature maps / class features), adding another ~4e-3.

    A larger margin only admits extra survivor classes (slower, never
    wrong); a too-small margin can silently drop a just-above-threshold
    detection (round-2 advisor finding)."""
    base = {"highest": 1e-4, "high": 1e-4,
            "default": 4e-3, "int8": 1.5e-2}[resample_precision]
    if compute_dtype == jnp.bfloat16:
        base += 4e-3
    return base


def unpack_detections(packed) -> Dict[str, np.ndarray]:
    """Unpack the [G, K, 6] array returned by `Evaluator.detect_single_image`
    (one device->host transfer) into {boxes, scores, valid} numpy arrays."""
    arr = np.asarray(packed)
    return {
        "boxes": arr[..., :4],
        "scores": arr[..., 4],
        "valid": arr[..., 5] > 0.5,
    }


def augment_class_images(class_images: List[np.ndarray], mode: str):
    """Expand class images with TTA views; returns (views, num_views_per_class).

    View layout matches the reference (evaluate.py:241-269): per class,
    contiguous [orig, rot90, rot180, rot270] / [orig, flip] / all 8.
    Arrays are [h, w, 3]; rot90 rotates in the (h, w) plane like torch
    rot90(1, [H, W]); horflip flips the width axis.
    """
    if not mode:
        return list(class_images), 1
    views = []
    for im in class_images:
        if mode == "rotation90":
            im90 = np.rot90(im, 1, axes=(0, 1))
            views += [im, im90, np.rot90(im90, 1, axes=(0, 1)),
                      np.rot90(im90, 2, axes=(0, 1))]
        elif mode == "horflip":
            views += [im, im[:, ::-1]]
        elif mode == "horflip_rotation90":
            im90 = np.rot90(im, 1, axes=(0, 1))
            im180 = np.rot90(im90, 1, axes=(0, 1))
            im270 = np.rot90(im180, 1, axes=(0, 1))
            views += [im, im90, im180, im270,
                      im[:, ::-1], im90[:, ::-1], im180[:, ::-1], im270[:, ::-1]]
        else:
            raise RuntimeError(f"Unknown class_image_augmentation: {mode}")
    num_views = {"rotation90": 4, "horflip": 2, "horflip_rotation90": 8}[mode]
    return [np.ascontiguousarray(v) for v in views], num_views


def _scan_head_chunks(model_config, tn_params, fm, feats_r, mask_r,
                      qs_r=None):
    """lax.scan the class-chunk head over one level's feature maps.

    feats_r/mask_r are chunked [n_chunks, chunk, ...]; qs_r (optional) are
    int8-bank dequant scales [n_chunks, chunk]. Returns
    (locs [B, n_chunks*chunk, 4, A], clss [B, n_chunks*chunk, A]).
    Shared by the one-phase fused program and phase 2 of the prescreened
    path — keep them from drifting.
    """
    from ..models.head import head_forward

    n_img = fm.shape[0]
    quantized = qs_r is not None

    def chunk_body(_, chunk_in):
        if quantized:
            feats_i, scales_i, mask_i = chunk_in
            feats_i = feats_i.astype(jnp.float32) * scales_i[
                :, None, None, None
            ]
        else:
            feats_i, mask_i = chunk_in
        out = head_forward(
            tn_params, fm, ClassHead(feats_i, mask_i),
            simple_affine=model_config.use_simplified_affine_model,
            use_inverse_geom_model=model_config.use_inverse_geom_model,
            train_mode=False,
            compute_dtype=model_config.dtype,
            resample_precision=model_config.resample_precision,
            corr_interior_first=model_config.corr_interior_first,
            resample_t_chunk=model_config.resample_t_chunk,
        )
        return None, (out["loc"], out["cls"])

    xs = (feats_r, qs_r, mask_r) if quantized else (feats_r, mask_r)
    if feats_r.shape[0] == 1:
        # single chunk (the headline C=16 protocol): inline the body
        # instead of a 1-step lax.scan. The while-loop boundary forces XLA
        # to materialize the body's big intermediates ([B, C, A, 225] corr
        # tensors) in loop-carried layouts and re-lay them out for the
        # consumers — measured 26 ms/dispatch of pure layout copies in the
        # r5 fused-program profile (BENCH_NOTES r5); inlining lets the
        # corr/TN/decode stages fuse across the former loop boundary.
        _, (locs, clss) = chunk_body(
            None, jax.tree_util.tree_map(lambda x: x[0], xs))
        return locs, clss
    # scan yields [n_chunks, B, chunk, ...] -> [B, C, ...]
    _, (locs, clss) = jax.lax.scan(chunk_body, None, xs)
    c_pad = feats_r.shape[0] * feats_r.shape[1]
    locs = locs.transpose(1, 0, 2, 3, 4).reshape((n_img, c_pad) + locs.shape[3:])
    clss = clss.transpose(1, 0, 2, 3).reshape((n_img, c_pad) + clss.shape[3:])
    return locs, clss


def _decode_and_pack(loc_p, cls_p, sizes, scales, num_views, cfg,
                     nms_across_classes):
    """View-split + vmapped pyramid decode + ONE packed [B, G, K, 6] array.

    loc_p/cls_p rows must already be trimmed to a multiple of num_views
    (views of one class are contiguous; the v::num_views split treats each
    view as an extra pyramid level for joint per-class NMS).
    """
    if num_views > 1:
        assert loc_p[0].shape[1] % num_views == 0, (
            loc_p[0].shape, num_views)
        loc_p = [l[:, v::num_views] for l in loc_p for v in range(num_views)]
        cls_p = [c_[:, v::num_views] for c_ in cls_p for v in range(num_views)]
        sizes_x = [s for s in sizes for _ in range(num_views)]
        scales_x = [s for s in scales for _ in range(num_views)]
    else:
        sizes_x, scales_x = sizes, scales

    def _decode_one(loc_list, cls_list):
        return decode_pyramid(
            loc_list, cls_list, sizes_x, scales_x,
            nms_iou_threshold=float(cfg.eval.nms_iou_threshold),
            score_threshold=float(cfg.eval.nms_score_threshold),
            pre_top_k=int(cfg.tpu.eval_pre_top_k),
            top_k=int(cfg.tpu.eval_top_k),
            nms_across_classes=nms_across_classes,
        )

    out = jax.vmap(_decode_one)(loc_p, cls_p)
    # pack into ONE array so the caller pays the tunnel's device->host
    # latency (~18 ms/transfer over axon) once, not once per leaf
    return jnp.concatenate(
        [out["boxes"],
         out["scores"][..., None],
         out["valid"][..., None].astype(jnp.float32)],
        axis=-1,
    )


def padded_gt_for_image(dataloader, image_id, class_ids, num_views, g_pad):
    """Padded GT arrays for one image (shared by the fused on-device loss
    path and the chunked host loss replay — the -1/False padding layout and
    the TTA view-0 row mapping must stay identical between them).

    Returns (boxes [g_pad, 4] original coords, labels [g_pad] local view-0
    row ids, difficult [g_pad] bool, valid [g_pad] bool).
    """
    ann = dataloader.dataset.get_image_annotation_for_imageid(image_id)
    local = dataloader.convert_label_ids_global_to_local(
        ann.get_field("labels"), class_ids
    )
    if num_views > 1:
        # GT positives land on each class's view-0 row; other view rows act
        # as extra negative labels (reference evaluate.py:293)
        local = [l * num_views for l in local]
    gt_boxes = np.zeros((g_pad, 4), np.float32)
    gt_labels = np.full((g_pad,), -1, np.int32)
    gt_difficult = np.zeros((g_pad,), bool)
    gt_valid = np.zeros((g_pad,), bool)
    k = len(ann)
    if k:
        gt_boxes[:k] = ann.bbox_xyxy
        gt_labels[:k] = local
        gt_difficult[:k] = ann.get_field("difficult")
        gt_valid[:k] = True
    return gt_boxes, gt_labels, gt_difficult, gt_valid


def _eval_losses_device(objective_cfg, cfg, loc_p, cls_p, d_boxes_levels,
                        gt_boxes, gt_labels, gt_difficult, gt_valid):
    """On-device eval loss metrics for an image batch (jit-compatible).

    Device-side equivalent of compute_eval_losses_for_image: per level,
    encode GT against default boxes in ORIGINAL coordinates and remap with
    the predicted locs; then run the objective PER IMAGE (batch of one each,
    matching the reference's per-image loss averaging, evaluate.py:99-135).

    Args:
      loc_p/cls_p: per level [B, C_rows, 4, A_l] / [B, C_rows, A_l]
        (raw rows, views NOT merged — under TTA, GT labels must already be
        mapped to each class's view-0 row by the caller).
      d_boxes_levels: per level [A_l, 4] anchors in original coordinates.
      gt_*: [B, G] padded ground truth (boxes in original coordinates).
    Returns (sorted_keys, losses [B, K]).
    """
    from .objective import compute_objective
    from .targets import encode_targets_single_image, remap_targets

    num_labels = loc_p[0].shape[1]
    loc_t, cls_t, cls_r = [], [], []
    for i_p in range(len(loc_p)):
        d_boxes = d_boxes_levels[i_p]
        lt, ct = jax.vmap(
            lambda gb, gl, gd, gv, db=d_boxes: encode_targets_single_image(
                gb, gl, gd, gv, db, num_labels,
                cfg.train.objective.positive_iou_threshold,
                cfg.train.objective.negative_iou_threshold,
            )
        )(gt_boxes, gt_labels, gt_difficult, gt_valid)
        cr, _, _ = remap_targets(
            loc_p[i_p], gt_boxes, gt_labels, gt_difficult, gt_valid,
            d_boxes,
            cfg.train.objective.remap_classification_targets_iou_pos,
            cfg.train.objective.remap_classification_targets_iou_neg,
        )
        loc_t.append(lt)
        cls_t.append(ct)
        cls_r.append(cr)

    loc_p_c = jnp.concatenate(loc_p, axis=3)
    loc_t_c = jnp.concatenate(loc_t, axis=3)
    cls_p_c = jnp.concatenate(cls_p, axis=2)
    cls_t_c = jnp.concatenate(cls_t, axis=2)
    cls_r_c = jnp.concatenate(cls_r, axis=2)

    def one_image(lp, lt, cp, ct, cr):
        losses, _ = compute_objective(
            objective_cfg, lp[None], lt[None], cp[None], ct[None],
            cls_targets_remapped=cr[None],
        )
        keys = sorted(k for k, v in losses.items() if jnp.ndim(v) == 0)
        return jnp.stack([losses[k] for k in keys]), keys

    keys = one_image(loc_p_c[0], loc_t_c[0], cls_p_c[0], cls_t_c[0],
                     cls_r_c[0])[1]
    stacked = jax.vmap(
        lambda lp, lt, cp, ct, cr: one_image(lp, lt, cp, ct, cr)[0]
    )(loc_p_c, loc_t_c, cls_p_c, cls_t_c, cls_r_c)
    return keys, stacked


class Evaluator:
    """Caches jitted decode specializations per pyramid-shape signature.

    With a `mesh`, the class axis shards over the mesh's "data" axis: each
    chip correlates the image batch against its slice of the class-feature
    bank (the TPU replacement for the reference's serial per-class loop,
    evaluate.py:323-331, scaled across chips instead of across time).
    """

    def __init__(self, model, cfg, logger_prefix="OS2D.eval", mesh=None):
        self.model = model
        self.cfg = cfg
        self.logger = logging.getLogger(logger_prefix)
        self.mesh = mesh
        self._decode_cache = {}

    def _decode_cfg_key(self):
        """Decode-affecting config baked into compiled programs — must be part
        of every program cache key, or a cfg edit after the first dispatch
        would silently serve a stale program."""
        cfg = self.cfg
        return (
            float(cfg.eval.nms_iou_threshold),
            float(cfg.eval.nms_score_threshold),
            int(cfg.tpu.eval_pre_top_k),
            int(cfg.tpu.eval_top_k),
            bool(cfg.eval.nms_across_classes),
            int(cfg.tpu.eval_class_chunk),
            bool(cfg.tpu.get("eval_class_chunk_per_level", True)),
            str(self.model.config.resample_precision),
        )

    def _shard_class_chunk(self, feats, mask):
        if self.mesh is None:
            return feats, mask
        from ..parallel.mesh import shard_classes

        return shard_classes(self.mesh, feats, mask)

    def _replicated(self, out):
        """Multi-host mesh: XLA may leave a dispatch's output sharded across
        hosts (not fully addressable -> np.asarray would fail); reshard to
        replicated — a tiny allgather of the packed detections, async like
        the dispatch itself. Single-host: identity."""
        if self.mesh is None or jax.process_count() == 1:
            return out
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), out)

    # ---- class features ----
    def build_class_heads(self, params, class_images: List[np.ndarray],
                          class_image_augmentation: str = ""):
        views, num_views = augment_class_images(
            class_images, class_image_augmentation
        )
        class_head = self.model.build_class_head_from_images(params, views)
        return class_head, num_views

    # ---- per-batch scoring ----
    def score_pyramid(self, params, pyramid_images: List[np.ndarray],
                      class_head: ClassHead, want_corners: bool = False):
        """Run backbone + head over all pyramid levels and all classes.

        Args:
          pyramid_images: per level [B, h_l, w_l, 3] arrays.
        Returns per level dicts with loc [B, Cv, 4, A_l], cls [B, Cv, A_l]
        (+ corners [B, Cv, 8, A_l] if want_corners).
        """
        from ..models.head import QuantizedClassHead, dequantize_class_head

        chunk = int(self.cfg.tpu.eval_class_chunk)
        quantized = isinstance(class_head, QuantizedClassHead)
        if self.mesh is not None:
            if quantized:
                # class sharding moves fp32 chunks; int8 banks are a
                # single-chip HBM optimization — dequantize up-front here
                class_head = dequantize_class_head(class_head)
                quantized = False
            # keep per-chip chunks intact: round the chunk up to the mesh size
            n_dev = self.mesh.devices.size
            chunk = max(chunk, n_dev)
            chunk = ((chunk + n_dev - 1) // n_dev) * n_dev
        feats_bank = (
            class_head.class_feats_q if quantized else class_head.class_feats
        )
        c_total = feats_bank.shape[0]
        outputs = []
        for level_images in pyramid_images:
            fm = self.model.extract_features(params, jnp.asarray(level_images))
            locs, clss, corners = [], [], []
            for start in range(0, c_total, chunk):
                end = min(start + chunk, c_total)
                # pad the last chunk to the full chunk size to avoid recompiles
                pad = chunk - (end - start)
                feats = feats_bank[start:end]
                mask = class_head.pool_mask[start:end]
                scales = class_head.scales[start:end] if quantized else None
                if pad:
                    feats = jnp.concatenate(
                        [feats, jnp.zeros((pad,) + feats.shape[1:], feats.dtype)]
                    )
                    mask = jnp.concatenate(
                        [mask, jnp.zeros((pad,) + mask.shape[1:], mask.dtype)]
                    )
                    if quantized:
                        scales = jnp.concatenate(
                            [scales, jnp.ones((pad,), scales.dtype)]
                        )
                if quantized:
                    chunk_head = QuantizedClassHead(feats, scales, mask)
                else:
                    feats, mask = self._shard_class_chunk(feats, mask)
                    chunk_head = ClassHead(feats, mask)
                out = self.model.apply_head(
                    params, fm, chunk_head, train_mode=False
                )
                locs.append(out["loc"][:, : end - start])
                clss.append(out["cls"][:, : end - start])
                if want_corners:
                    corners.append(out["corners"][:, : end - start])
            level = {
                "loc": jnp.concatenate(locs, axis=1),
                "cls": jnp.concatenate(clss, axis=1),
            }
            if want_corners:
                level["corners"] = jnp.concatenate(corners, axis=1)
            outputs.append(level)
        return outputs

    # ---- fused single-dispatch detection ----
    def detect_single_image(self, params, image_u8, class_head,
                            level_sizes, inverse_scales, img_normalization,
                            num_views: int = 1):
        """Single-image wrapper over `detect_images`: [H, W, 3] uint8 in ->
        packed [G, K, 6] detections out (one fused dispatch)."""
        batched = self.detect_images(
            params, image_u8[None] if image_u8.ndim == 3 else image_u8,
            class_head, level_sizes, inverse_scales, img_normalization,
            num_views=num_views,
        )
        return batched[0]

    def detect_images(self, params, images_u8, class_head,
                      level_sizes, inverse_scales, img_normalization,
                      num_views: int = 1, objective_cfg=None, gt=None):
        """ONE jitted program per signature: uint8 image batch [B, H, W, 3]
        in -> top-K detections out as a single packed [B, G, K, 6] array
        (x1, y1, x2, y2, score, valid) — unpack on host with
        `unpack_detections`. Builds the normalized pyramid, runs the backbone
        + head over all levels and class chunks, and decodes + NMS-es on
        device — a single host->device dispatch per image batch (the
        per-level/per-chunk dispatch chain costs real latency over a remote-
        device tunnel, and the per-dispatch fixed overhead amortizes over B).

        Class chunks run under lax.scan (not a Python unroll), so the compiled
        program size is independent of the class count — grozi-scale C~1000
        uses the same program as C=16. Accepts an int8 QuantizedClassHead: the
        bank stays int8 in HBM and each chunk dequantizes inside the scan
        body. With a mesh, the chunk's class axis shards over the mesh (each
        chip correlates against its slice of every chunk; the TPU replacement
        for the reference's serial per-class loop, evaluate.py:226-331).

        With `objective_cfg` + `gt` (padded dict: boxes [B, G, 4] in
        original coordinates, labels [B, G] view-0 row ids, difficult/valid
        [B, G]), the SAME program also encodes targets, remaps and computes
        per-image loss metrics on device, returning (packed, keys,
        losses [B, K]) — the fused replacement for the chunked loss path."""
        from ..models.head import QuantizedClassHead

        with_losses = objective_cfg is not None
        quantized = isinstance(class_head, QuantizedClassHead)
        feats_bank = (
            class_head.class_feats_q if quantized else class_head.class_feats
        )
        key = (
            "detect",
            isinstance(images_u8, PackedYuv420),  # wire format bakes a
            # different decode preamble (ops/pixel_format.py)
            images_u8.shape,
            tuple(level_sizes),
            tuple(tuple(s) for s in inverse_scales),
            feats_bank.shape,
            num_views,
            quantized,
            None if self.mesh is None else self.mesh.devices.size,
            str(self.cfg.tpu.get("eval_shard_axis", "classes")),
            self._decode_cfg_key(),
            # the loss program also bakes the encode/remap IoU thresholds
            (objective_cfg, gt["boxes"].shape,
             float(self.cfg.train.objective.positive_iou_threshold),
             float(self.cfg.train.objective.negative_iou_threshold),
             float(self.cfg.train.objective.remap_classification_targets_iou_pos),
             float(self.cfg.train.objective.remap_classification_targets_iou_neg),
             ) if with_losses else None,
        )
        if (self.mesh is not None
                and str(self.cfg.tpu.get("eval_shard_axis", "classes"))
                == "images"
                and images_u8.shape[0] % self.mesh.devices.size != 0):
            raise ValueError(
                f"eval_shard_axis='images' needs the image batch "
                f"({images_u8.shape[0]}) to be a multiple of the mesh size "
                f"({self.mesh.devices.size}); set eval.batch_size accordingly"
            )
        if key not in self._decode_cache:
            from ..models.resnet import resnet_c4_forward
            from .decode import default_boxes_for_image_size

            model = self.model
            cfg = self.cfg
            # two mesh strategies (SURVEY.md §2.16 work-grid sharding):
            #   "classes": each chip scores a slice of the class bank for
            #              every image — the huge-catalog mode;
            #   "images":  each chip owns a slice of the image batch (set
            #              eval.batch_size to the mesh size) — near-linear
            #              scaling for many-image datasets.
            shard_axis = str(cfg.tpu.get("eval_shard_axis", "classes"))
            chunk = int(cfg.tpu.eval_class_chunk)
            if self.mesh is not None and shard_axis == "classes":
                # keep every chip busy within a chunk
                n_dev = self.mesh.devices.size
                chunk = ((max(chunk, n_dev) + n_dev - 1) // n_dev) * n_dev
            c_total = feats_bank.shape[0]
            n_chunks = (c_total + chunk - 1) // chunk
            c_pad = n_chunks * chunk
            mean = jnp.asarray(img_normalization["mean"], jnp.float32)
            std = jnp.asarray(img_normalization["std"], jnp.float32)
            sizes = list(level_sizes)
            scales = [tuple(s) for s in inverse_scales]

            # ASYMMETRIC PER-LEVEL CLASS CHUNKS (r4, VERDICT r3 item 3a):
            # eval_class_chunk bounds the [chunk, A_l, 225] correlation
            # tensor at the LARGEST pyramid level (the memory cliff,
            # BENCH_NOTES r3); smaller levels can run proportionally larger
            # chunks — fewer scan steps, less per-chunk fixed overhead (the
            # r3 chunk sweep at C=1024: 128 > 64 > 32 until memory).
            # Numerics identical (chunking only batches classes). Mesh
            # class-sharding keeps the uniform chunk (a per-level reshape
            # across the sharded class axis would insert collectives).
            from ..structures.feature_map import feature_map_size_for_image

            per_level = (self.mesh is None and n_chunks > 1 and bool(
                cfg.tpu.get("eval_class_chunk_per_level", True)))
            if per_level:
                areas = []
                for sz in sizes:
                    fm_sz = feature_map_size_for_image(
                        FeatureMapSize(w=sz.w, h=sz.h))
                    areas.append(fm_sz.h * fm_sz.w)
                a_max = max(areas)
                cap = (c_total + 7) // 8 * 8

                def _level_chunk(a_l):
                    c_l = (chunk * a_max // a_l) // 8 * 8
                    return min(max(chunk, c_l), cap)

                level_chunks = [_level_chunk(a) for a in areas]
            else:
                level_chunks = [chunk] * len(sizes)

            def _pad_to(x, cp):
                if cp == c_total:
                    return x
                return jnp.concatenate(
                    [x, jnp.zeros((cp - c_total,) + x.shape[1:], x.dtype)]
                )

            def _pad_c(x):
                return _pad_to(x, c_pad)

            if with_losses:
                d_boxes_levels = [
                    jnp.asarray(default_boxes_for_image_size(sz))
                    * jnp.asarray([sx, sy, sx, sy], jnp.float32)
                    for sz, (sx, sy) in zip(sizes, scales)
                ]
                loss_keys = []  # filled at trace time

            @jax.jit
            def detect(params, images_u8, class_feats, q_scales, pool_mask,
                       gt_boxes, gt_labels, gt_difficult, gt_valid):
                # uint8 RGB or PackedYuv420 wire format -> f32 0..255
                img = (decode_to_float_rgb(images_u8) / 255.0 - mean) / std

                bank_cache = {}

                def _chunked_bank(ch):
                    """(feats_r, mask_r, qs_r) reshaped to [n_ch, ch, ...]."""
                    if ch in bank_cache:
                        return bank_cache[ch]
                    n_ch = (c_total + ch - 1) // ch
                    cp = n_ch * ch
                    f = _pad_to(class_feats, cp).reshape(
                        (n_ch, ch) + class_feats.shape[1:])
                    m = _pad_to(pool_mask, cp).reshape(
                        (n_ch, ch) + pool_mask.shape[1:])
                    q = None
                    if quantized:
                        qs = jnp.concatenate(
                            [q_scales,
                             jnp.ones((cp - c_total,), q_scales.dtype)]
                        ) if cp != c_total else q_scales
                        q = qs.reshape(n_ch, ch)
                    bank_cache[ch] = (f, m, q)
                    return bank_cache[ch]

                feats_r, mask_r, qs_r = _chunked_bank(chunk)
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P
                    from ..parallel.mesh import DATA_AXIS

                    if shard_axis == "images":
                        img = jax.lax.with_sharding_constraint(
                            img, NamedSharding(self.mesh, P(DATA_AXIS)))
                    else:
                        shard = NamedSharding(self.mesh, P(None, DATA_AXIS))
                        feats_r = jax.lax.with_sharding_constraint(
                            feats_r, shard)
                        mask_r = jax.lax.with_sharding_constraint(
                            mask_r, shard)

                n_img = images_u8.shape[0]
                loc_p, cls_p = [], []
                for sz, ch_l in zip(sizes, level_chunks):
                    if (sz.h, sz.w) == images_u8.shape[1:3]:
                        lvl = img
                    else:
                        lvl = jax.image.resize(
                            img, (n_img, sz.h, sz.w, 3), method="bilinear",
                            antialias=True,
                        )
                    fm = resnet_c4_forward(
                        params["backbone"], lvl, model.config.dtype
                    )
                    if self.mesh is None and ch_l != chunk:
                        f_l, m_l, q_l = _chunked_bank(ch_l)
                    else:
                        f_l, m_l, q_l = feats_r, mask_r, qs_r
                    locs, clss = _scan_head_chunks(
                        model.config, params["transform_net"], fm,
                        f_l, m_l, q_l,
                    )
                    loc_p.append(locs[:, :c_total])
                    cls_p.append(clss[:, :c_total])

                packed = _decode_and_pack(
                    loc_p, cls_p, sizes, scales, num_views, cfg,
                    bool(cfg.eval.nms_across_classes),
                )
                if not with_losses:
                    return packed
                keys, losses = _eval_losses_device(
                    objective_cfg, cfg, loc_p, cls_p, d_boxes_levels,
                    gt_boxes, gt_labels, gt_difficult, gt_valid,
                )
                if not loss_keys:
                    loss_keys.extend(keys)
                return packed, losses

            self._decode_cache[key] = (
                detect, loss_keys if with_losses else None)
        q_scales = class_head.scales if quantized else jnp.zeros((0,), jnp.float32)
        fn, loss_keys = self._decode_cache[key]
        if with_losses:
            gt_args = (jnp.asarray(gt["boxes"]), jnp.asarray(gt["labels"]),
                       jnp.asarray(gt["difficult"]), jnp.asarray(gt["valid"]))
        else:
            z = jnp.zeros((0,), jnp.float32)
            gt_args = (z, z, z, z)
        img_arg = (images_u8 if isinstance(images_u8, PackedYuv420)
                   else jnp.asarray(images_u8))
        args = (params, img_arg, feats_bank, q_scales,
                class_head.pool_mask) + gt_args
        if self.mesh is not None:
            with self.mesh:
                out = self._replicated(fn(*args))
        else:
            out = fn(*args)
        if with_losses:
            packed, losses = out
            return packed, list(loss_keys), losses
        return out

    # ---- prescreened two-phase detection (large catalogs) ----
    def prescreen_applicable(self, class_head, num_views: int = 1) -> bool:
        """The no-miss class prescreen is available when the decode threshold is
        finite (scores are mask-weighted averages of correlations, so the
        per-class correlation ceiling bounds every decodable score) and the
        bank is fp32. Under nms_across_classes the padded duplicate rows are
        score-masked to -inf in phase 2 so they cannot suppress real
        detections in the joint NMS; pruned classes cannot suppress anything
        either (they have no detections above the decode threshold).
        Composes with a class-sharded mesh (both phases shard their class
        chunks); image-axis sharding is not supported (the surviving class
        set is chosen jointly for the whole batch)."""
        from ..models.head import QuantizedClassHead

        return (
            bool(self.cfg.tpu.get("eval_class_prescreen", True))
            and np.isfinite(float(self.cfg.eval.nms_score_threshold))
            and not isinstance(class_head, QuantizedClassHead)
            and (self.mesh is None
                 or str(self.cfg.tpu.get("eval_shard_axis", "classes"))
                 == "classes")
        )

    def detect_images_prescreened(self, params, images_u8, class_head,
                                  level_sizes, inverse_scales,
                                  img_normalization, num_views: int = 1):
        """Two-phase fused detection for LARGE catalogs (no-miss prescreen:
        no detection above threshold is dropped, up to the derived numeric
        margin — see prescreen_margin; surviving detections match the full
        path to ~1e-4 score / 1e-3 box tolerance, tests/test_prescreen.py).

        Phase 1 (one dispatch): pyramid + backbone once, then per-class
        correlation ceilings max_{anchor, template cell} corr[c] per level.
        Since the resampled recognition score is a convex combination of
        correlation values (bilinear weights and the pool mask are
        non-negative and sum to 1; border clamp only repeats values), a class
        whose ceiling is <= eval.nms_score_threshold cannot produce a valid
        detection — decode drops scores <= threshold (engine/decode.py).
        Phase 2 (one dispatch): alignment + resample + decode on ONLY the
        surviving classes (padded to a power-of-two number of class chunks to
        bound recompiles); backbone feature maps stay on device between the
        phases. Returns the same packed [B, G, K, 6] array as detect_images
        with pruned classes all-invalid.

        The reference has no analogue — its eval runs every class serially
        (os2d/engine/evaluate.py:323-331). The ~10x head-cost asymmetry
        (correlation is <10% of the per-class head cost, BENCH_NOTES.md)
        makes absent classes nearly free.
        """
        feats_bank = class_head.class_feats
        c_total = feats_bank.shape[0]
        n_groups = c_total // num_views
        threshold = float(self.cfg.eval.nms_score_threshold)
        top_k = int(self.cfg.tpu.eval_top_k)
        chunk = int(self.cfg.tpu.eval_class_chunk)
        mesh_size = None if self.mesh is None else self.mesh.devices.size
        if mesh_size is not None:
            # both phases shard their class chunks over the mesh; keep every
            # chip busy within a chunk (same rule as detect_images)
            chunk = ((max(chunk, mesh_size) + mesh_size - 1)
                     // mesh_size) * mesh_size
        model = self.model
        cfg = self.cfg

        def _shard_chunked(x):
            if self.mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import DATA_AXIS

            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, P(None, DATA_AXIS)))

        key1 = ("prescreen", isinstance(images_u8, PackedYuv420),
                images_u8.shape, tuple(level_sizes),
                feats_bank.shape, chunk, mesh_size)
        # (ceilings don't depend on decode cfg)
        if key1 not in self._decode_cache:
            from ..models.resnet import resnet_c4_forward
            from ..ops.geometry import l2_normalize_channels

            n_chunks1 = (c_total + chunk - 1) // chunk
            c_pad1 = n_chunks1 * chunk
            mean = jnp.asarray(img_normalization["mean"], jnp.float32)
            std = jnp.asarray(img_normalization["std"], jnp.float32)
            sizes = list(level_sizes)

            @jax.jit
            def prescreen(params, images_u8, class_feats):
                img = (decode_to_float_rgb(images_u8) / 255.0 - mean) / std
                n_img = images_u8.shape[0]
                feats_p = class_feats
                if c_pad1 != c_total:
                    feats_p = jnp.concatenate([
                        feats_p,
                        jnp.zeros((c_pad1 - c_total,) + feats_p.shape[1:],
                                  feats_p.dtype),
                    ])
                feats_r = _shard_chunked(feats_p.reshape(
                    (n_chunks1, chunk) + class_feats.shape[1:]))
                fms = []
                ceil = jnp.full((c_pad1,), -jnp.inf, jnp.float32)
                for sz in sizes:
                    if (sz.h, sz.w) == images_u8.shape[1:3]:
                        lvl = img
                    else:
                        lvl = jax.image.resize(
                            img, (n_img, sz.h, sz.w, 3), method="bilinear",
                            antialias=True,
                        )
                    fm = resnet_c4_forward(
                        params["backbone"], lvl, model.config.dtype
                    )
                    fms.append(fm)
                    fmn = l2_normalize_channels(fm, eps=1e-5, axis=-1)

                    def chunk_max(_, feats_i):
                        corr = jnp.einsum(
                            "bhwf,cyxf->bchwxy",
                            fmn.astype(model.config.dtype),
                            feats_i.astype(model.config.dtype),
                            preferred_element_type=jnp.float32,
                        )
                        # max over batch, anchors and template cells: the
                        # class subset is shared across the image batch
                        return None, jnp.max(
                            corr.reshape(corr.shape[0], chunk, -1),
                            axis=(0, 2),
                        )

                    _, m = jax.lax.scan(chunk_max, None, feats_r)
                    ceil = jnp.maximum(ceil, m.reshape(c_pad1))
                return tuple(fms), ceil[:c_total]

            self._decode_cache[key1] = prescreen

        img_arg = (images_u8 if isinstance(images_u8, PackedYuv420)
                   else jnp.asarray(images_u8))
        if self.mesh is not None:
            with self.mesh:
                fms, ceil = self._replicated(self._decode_cache[key1](
                    params, img_arg, feats_bank))
        else:
            fms, ceil = self._decode_cache[key1](
                params, img_arg, feats_bank)
        # group ceilings over TTA views; the margin absorbs the worst-case
        # rounding difference between phases (see prescreen_margin)
        margin = prescreen_margin(self.model.config.resample_precision,
                                  self.model.config.dtype)
        ceil_groups = np.asarray(ceil).reshape(n_groups, num_views).max(1)
        sel = np.nonzero(ceil_groups > threshold - margin)[0]
        n_img = images_u8.shape[0]
        if sel.size == 0:
            return np.zeros((n_img, n_groups, top_k, 6), np.float32)

        # pad the surviving rows to a power-of-two chunk count (bounds the
        # number of compiled phase-2 programs to log2(C / chunk) variants)
        n_sel_rows = int(sel.size) * num_views
        n_chunks2 = max(1, -(-n_sel_rows // chunk))
        n_chunks2 = 1 << (n_chunks2 - 1).bit_length()
        n_chunks2 = min(n_chunks2, -(-c_total // chunk))
        c_sel_pad = min(n_chunks2 * chunk, ((c_total + chunk - 1) // chunk) * chunk)
        n_chunks2 = c_sel_pad // chunk

        row_idx = (sel[:, None] * num_views + np.arange(num_views)).reshape(-1)
        pad_rows = c_sel_pad - n_sel_rows
        row_idx_p = np.concatenate([row_idx, np.zeros((pad_rows,), np.int64)])
        sub_feats = jnp.take(feats_bank, jnp.asarray(row_idx_p), axis=0)
        sub_mask = jnp.take(class_head.pool_mask, jnp.asarray(row_idx_p), axis=0)

        key2 = ("prescreen_head", images_u8.shape, tuple(level_sizes),
                tuple(tuple(s) for s in inverse_scales), c_sel_pad, num_views,
                mesh_size, self._decode_cfg_key())
        if key2 not in self._decode_cache:
            sizes = list(level_sizes)
            scales = [tuple(s) for s in inverse_scales]
            # c_sel_pad need not divide num_views (chunk-granular padding);
            # trim to the largest view-aligned row count — real rows are
            # sel.size * num_views <= this by construction
            g_rows = (c_sel_pad // num_views) * num_views

            @jax.jit
            def head_decode(params, fms, sub_feats, sub_mask, row_valid):
                feats_r = _shard_chunked(sub_feats.reshape(
                    (n_chunks2, chunk) + sub_feats.shape[1:]))
                mask_r = _shard_chunked(sub_mask.reshape(
                    (n_chunks2, chunk) + sub_mask.shape[1:]))
                loc_p, cls_p = [], []
                for fm in fms:
                    locs, clss = _scan_head_chunks(
                        model.config, params["transform_net"], fm,
                        feats_r, mask_r,
                    )
                    # padded duplicate rows must not suppress real ones in a
                    # joint (nms_across_classes) NMS: mask their scores to
                    # -inf so decode drops them before suppression
                    clss = jnp.where(
                        row_valid[None, :g_rows, None], clss[:, :g_rows],
                        -jnp.inf,
                    )
                    loc_p.append(locs[:, :g_rows])
                    cls_p.append(clss)
                return _decode_and_pack(
                    loc_p, cls_p, sizes, scales, num_views, cfg,
                    bool(cfg.eval.nms_across_classes),
                )

            self._decode_cache[key2] = head_decode

        row_valid = jnp.asarray(np.arange(c_sel_pad) < n_sel_rows)
        if self.mesh is not None:
            with self.mesh:
                packed = np.asarray(self._replicated(self._decode_cache[key2](
                    params, fms, sub_feats, sub_mask, row_valid)))
        else:
            packed = np.asarray(self._decode_cache[key2](
                params, fms, sub_feats, sub_mask, row_valid))
        full = np.zeros((n_img, n_groups, top_k, 6), np.float32)
        full[:, sel] = packed[:, : sel.size]
        return full

    # ---- decoding ----
    def decode_image(self, level_outputs, image_index: int,
                     img_sizes: List[FeatureMapSize],
                     inverse_scales: List[tuple], num_views: int):
        """Decode one image of the batch into top-K detections per class."""
        loc_pyramid = [o["loc"][image_index] for o in level_outputs]
        cls_pyramid = [o["cls"][image_index] for o in level_outputs]

        if num_views > 1:
            # views of one class occupy contiguous rows [c*V .. c*V+V-1]; merge
            # them for joint per-class NMS by treating each view as an EXTRA
            # pyramid level: slice rows [v::V] -> [C, ...] per (level, view)
            loc_pyramid = [
                loc[v::num_views] for loc in loc_pyramid for v in range(num_views)
            ]
            cls_pyramid = [
                cls[v::num_views] for cls in cls_pyramid for v in range(num_views)
            ]
            img_sizes = [s for s in img_sizes for _ in range(num_views)]
            inverse_scales = [s for s in inverse_scales for _ in range(num_views)]

        key = (
            tuple(img_sizes),
            tuple(x.shape for x in loc_pyramid),
            tuple(inverse_scales),
            self._decode_cfg_key(),
        )
        if key not in self._decode_cache:
            sizes = list(img_sizes)
            scales = list(inverse_scales)

            @jax.jit
            def _decode(loc_p, cls_p):
                return decode_pyramid(
                    loc_p, cls_p, sizes, scales,
                    nms_iou_threshold=float(self.cfg.eval.nms_iou_threshold),
                    score_threshold=float(self.cfg.eval.nms_score_threshold),
                    pre_top_k=int(self.cfg.tpu.eval_pre_top_k),
                    top_k=int(self.cfg.tpu.eval_top_k),
                    nms_across_classes=bool(self.cfg.eval.nms_across_classes),
                )

            self._decode_cache[key] = _decode
        return self._decode_cache[key](loc_pyramid, cls_pyramid)


def compute_eval_losses_for_image(level_outputs, image_index, dataloader,
                                  image_id, img_sizes, inverse_scales,
                                  objective_cfg, cfg, num_views: int = 1):
    """Loss metrics on eval data (os2d/engine/evaluate.py:99-135): encode GT
    per pyramid level against inverse-transformed default boxes (original
    coordinates), remap, and run the objective.

    Under class TTA the score rows are (class, view) pairs; like the
    reference (evaluate.py:293, first-match local mapping), GT positives land
    on each class's view-0 row and the other view rows are treated as extra
    negative labels."""
    from .decode import default_boxes_for_image_size
    from .objective import compute_objective
    from .targets import encode_targets_single_image, remap_targets

    ann = dataloader.dataset.get_image_annotation_for_imageid(image_id)
    class_ids = sorted(list(dataloader.dataset.get_class_ids()))
    gt_boxes, gt_labels, gt_difficult, gt_valid = padded_gt_for_image(
        dataloader, image_id, class_ids, num_views, max(8, len(ann))
    )

    num_labels = level_outputs[0]["cls"].shape[1]
    loc_p, cls_p, loc_t, cls_t, cls_r = [], [], [], [], []
    for i_p, out in enumerate(level_outputs):
        sx, sy = inverse_scales[i_p]
        d_boxes = np.asarray(default_boxes_for_image_size(img_sizes[i_p])) * (
            np.asarray([sx, sy, sx, sy], np.float32)
        )
        lt, ct = encode_targets_single_image(
            jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_difficult), jnp.asarray(gt_valid),
            jnp.asarray(d_boxes), num_labels,
            cfg.train.objective.positive_iou_threshold,
            cfg.train.objective.negative_iou_threshold,
        )
        ls = out["loc"][image_index][None]
        cr, _, _ = remap_targets(
            ls, jnp.asarray(gt_boxes)[None], jnp.asarray(gt_labels)[None],
            jnp.asarray(gt_difficult)[None], jnp.asarray(gt_valid)[None],
            jnp.asarray(d_boxes),
            cfg.train.objective.remap_classification_targets_iou_pos,
            cfg.train.objective.remap_classification_targets_iou_neg,
        )
        loc_p.append(ls)
        cls_p.append(out["cls"][image_index][None])
        loc_t.append(lt[None])
        cls_t.append(ct[None])
        cls_r.append(cr)

    losses, _ = compute_objective(
        objective_cfg,
        jnp.concatenate(loc_p, axis=3), jnp.concatenate(loc_t, axis=3),
        jnp.concatenate(cls_p, axis=2), jnp.concatenate(cls_t, axis=2),
        cls_targets_remapped=jnp.concatenate(cls_r, axis=2),
    )
    return {k: float(v) for k, v in losses.items() if np.ndim(v) == 0}


def evaluate(dataloader, model, params, cfg, criterion=None,
             print_per_class_results=False, logger_prefix="OS2D.eval",
             mesh=None):
    """Full-dataset evaluation -> {mAP@iou: value, ...} (os2d/engine/evaluate.py:21-174).

    `criterion` may be an ObjectiveConfig: loss metrics are then computed on
    the eval data and averaged into the results (reference evaluate.py:99-135).
    With a `mesh`, classes shard across its devices.
    """
    logger = logging.getLogger(f"{logger_prefix}.evaluate")
    dataset_name = dataloader.get_name()
    logger.info(f"Starting evaluation on {dataset_name}")
    t_start = time.time()

    if bool(cfg.tpu.get("fold_bn", False)):
        from ..models.os2d import fold_inference_params

        params = fold_inference_params(params)

    evaluator = Evaluator(model, cfg, logger_prefix, mesh=mesh)
    class_images, _, class_ids = dataloader.get_all_class_images()
    class_head, num_views = evaluator.build_class_heads(
        params, class_images, cfg.eval.class_image_augmentation
    )

    quantize_bank = bool(cfg.tpu.get("quantize_class_feats", False))
    if quantize_bank:
        from ..models.head import quantize_class_head

        class_head = quantize_class_head(class_head)

    use_device_pyramid = bool(cfg.tpu.get("device_side_pyramid", True))
    viz_cfg = cfg.visualization.eval
    # TWO eval paths (the fused one scans class chunks on device and computes
    # loss metrics on device, so class count / int8 bank / mesh / criterion
    # no longer force the slow path):
    #   fused:   one jitted dispatch per image batch (uint8 in -> detections
    #            [+ per-image losses] out)
    #   chunked: per-level, per-chunk dispatches; needed when raw level scores
    #            must come back to the host (heatmaps) or device-side pyramids
    #            are disabled
    fused_blockers = []
    if not use_device_pyramid:
        fused_blockers.append("cfg.tpu.device_side_pyramid=False")
    if viz_cfg.show_class_heatmaps:
        fused_blockers.append("show_class_heatmaps needs raw level scores")
    use_fused = not fused_blockers
    if use_fused:
        logger.info("eval path: fused single-dispatch")
    else:
        logger.info(
            "eval path: chunked per-level (fused blocked by: "
            + "; ".join(fused_blockers) + ")"
        )
    viz_dir = ""
    if (viz_cfg.show_detections or viz_cfg.show_gt_boxes
            or viz_cfg.show_class_heatmaps) and cfg.output.path:
        import os as _os

        viz_dir = _os.path.join(cfg.output.path, f"viz_{dataset_name}")
        _os.makedirs(viz_dir, exist_ok=True)

    def _heatmaps(image_id, level_outputs, i_image, img_sizes):
        """Per-class score heatmaps per pyramid level
        (reference evaluate.py:122-124; saved to files instead of visdom)."""
        if not (viz_dir and viz_cfg.show_class_heatmaps and num_views == 1):
            return
        want_imgs = list(viz_cfg.images_for_heatmaps)
        if want_imgs and image_id not in want_imgs:
            return
        from ..structures.feature_map import feature_map_size_for_image
        from ..utils.visualization import show_class_heatmap

        img = np.asarray(
            dataloader.dataset._get_dataset_image_by_id(image_id), np.float32
        ) / 255.0
        want_labels = [int(g) for g in viz_cfg.labels_for_heatmaps] or [
            int(c) for c in class_ids[:4]
        ]
        for i_p, out in enumerate(level_outputs):
            fm = feature_map_size_for_image(img_sizes[i_p])
            cls = np.asarray(out["cls"][i_image])  # [C, A]
            for gid in want_labels:
                if gid not in class_ids:
                    continue
                row = class_ids.index(gid)
                show_class_heatmap(
                    img, cls[row].reshape(fm.h, fm.w),
                    save_path=f"{viz_dir}/heatmap_{image_id}_cls{gid}_lvl{i_p}.png",
                )

    def _visualize(image_id, det_boxes, det_scores, det_labels):
        """Config-driven visual debugging (os2d/config.py:230-245)."""
        if not viz_dir:
            return
        from ..utils.visualization import show_detections, show_gt_boxes

        img = np.asarray(
            dataloader.dataset._get_dataset_image_by_id(image_id), np.float32
        ) / 255.0
        if viz_cfg.show_detections:
            show_detections(
                img, det_boxes, det_scores, det_labels,
                max_detections=viz_cfg.max_detections,
                score_threshold=viz_cfg.score_threshold,
                save_path=f"{viz_dir}/detections_{image_id}.png",
            )
        if viz_cfg.show_gt_boxes:
            ann = dataloader.dataset.get_image_annotation_for_imageid(image_id)
            show_gt_boxes(
                img, ann.bbox_xyxy, ann.get_field("labels"),
                ann.get_field("difficult"),
                save_path=f"{viz_dir}/gt_{image_id}.png",
            )

    if use_fused:
        # single-dispatch path: uint8 image in -> detections out, one program
        predictions = []
        gts = []
        all_image_ids = []
        img_norm = dataloader.img_normalization

        batch_size = max(1, int(cfg.eval.batch_size))

        def _prefetched_items():
            """Producer-thread lookahead: host image prep + the host->device
            upload of batch i+1..i+depth run while batch i computes.

            The upload of the base uint8 images (~3.7 MB/image at the 1280px
            protocol) otherwise serializes with compute over the axon tunnel —
            measured 3.2 img/s end-to-end vs 5.2 compute-only; overlap
            recovers most of the gap (BENCH_NOTES.md). Depth
            cfg.tpu.eval_prefetch_depth defaults to 1: CONCURRENT uploads
            contend on this tunnel (two full batches in flight = 12.8 MB/s
            aggregate vs 20.3 single-stream), and depth 2 measured 4.9 vs
            8.2 img/s end-to-end at depth 1 in the same window
            (BENCH_NOTES r3 — reversing the r2 depth-2 reading, which was
            taken in a window where the contention hid inside the noise).
            Partial tail batches are padded by repeating the last image (each
            bucket batch is uniform in size); n_real marks the genuine rows."""
            import queue as _queue
            import threading

            depth = max(1, int(cfg.tpu.get("eval_prefetch_depth", 1)))
            q = _queue.Queue(maxsize=depth)

            def producer():
                try:
                    for item in dataloader.make_raw_iterator_for_all_images(
                            batch_size):
                        (batch_ids, base_images, level_sizes, inv_scales,
                         initial_sizes) = item
                        n_real = len(base_images)
                        stacked = np.stack(
                            base_images
                            + [base_images[-1]] * (batch_size - n_real)
                        )
                        # async transfer start — at depth 1 at most one
                        # upload is outstanding, which is the measured-good
                        # shape (concurrent in-flight uploads contend,
                        # BENCH_NOTES r3). cfg.tpu.upload_streams > 1 splits
                        # the put into parallel chunked transfers;
                        # upload_serialize=True adds a completion fence
                        # (opt-in, see config.py).
                        # YUV 4:2:0 wire format: halves the upload payload
                        # (the binding resource of this loop) at a mAP-gated
                        # quality cost; "auto" = yuv420 on accelerator
                        # backends, rgb8 (bit-exact) on CPU
                        # (ops/pixel_format.py, cfg.tpu.upload_pixel_format)
                        pix = str(cfg.tpu.get("upload_pixel_format", "auto"))
                        if pix == "auto":
                            pix = ("rgb8" if jax.default_backend() == "cpu"
                                   else "yuv420")
                        if (pix == "yuv420" and stacked.shape[1] % 2 == 0
                                and stacked.shape[2] % 2 == 0):
                            packed_host = rgb_to_yuv420(stacked)
                            dev = PackedYuv420(
                                parallel_device_put(
                                    packed_host.data,
                                    streams=int(
                                        cfg.tpu.get("upload_streams", 2)),
                                    serialize=bool(
                                        cfg.tpu.get("upload_serialize",
                                                    False))),
                                packed_host.shape)
                        else:
                            dev = parallel_device_put(
                                stacked,
                                streams=int(cfg.tpu.get("upload_streams", 2)),
                                serialize=bool(
                                    cfg.tpu.get("upload_serialize", False)))
                        q.put((batch_ids, dev, level_sizes, inv_scales,
                               initial_sizes))
                except BaseException as e:  # surface in the consumer
                    q.put(("__error__", e))
                q.put(None)

            threading.Thread(target=producer, daemon=True).start()
            while True:
                item = q.get()
                if item is None:
                    return
                if item[0] == "__error__":
                    raise item[1]
                yield item

        def _finalize(batch_ids_b, initial_sizes_b, packed):
            """Blocks on the packed [B, G, K, 6] result (held one step so its
            ~18 ms download rides behind the next batch's compute) and records
            every genuine image row (padded tail rows are skipped)."""
            out = unpack_detections(packed)
            for i_image, image_id in enumerate(batch_ids_b):
                boxes = out["boxes"][i_image]
                scores = out["scores"][i_image]
                valid = out["valid"][i_image]
                det_boxes, det_scores, det_labels = [], [], []
                for row in range(boxes.shape[0]):
                    m = valid[row]
                    det_boxes.append(boxes[row][m])
                    det_scores.append(scores[row][m])
                    det_labels.append(
                        np.full(int(m.sum()), class_ids[row], np.int64))
                init_size = initial_sizes_b[i_image]
                pred = {
                    "boxes": np.concatenate(det_boxes) if det_boxes else np.zeros((0, 4), np.float32),
                    "scores": np.concatenate(det_scores) if det_scores else np.zeros((0,), np.float32),
                    "labels": np.concatenate(det_labels) if det_labels else np.zeros((0,), np.int64),
                    "image_size": (init_size.w, init_size.h),
                }
                predictions.append(pred)
                all_image_ids.append(image_id)
                _visualize(image_id, pred["boxes"], pred["scores"], pred["labels"])
                ann = dataloader.dataset.get_image_annotation_for_imageid(image_id)
                gts.append(
                    {
                        "boxes": ann.bbox_xyxy,
                        "labels": ann.get_field("labels"),
                        "difficult": ann.get_field("difficult"),
                        "image_size": (ann.image_size.w, ann.image_size.h),
                    }
                )

        # loss metrics need every class row's scores (negatives contribute),
        # so the prescreen is bypassed when a criterion is requested
        use_prescreen = (criterion is None
                         and evaluator.prescreen_applicable(class_head, num_views))
        if use_prescreen:
            logger.info(
                "eval path: fused two-phase (no-miss class prescreen at "
                f"score threshold {float(cfg.eval.nms_score_threshold)})"
            )

        loss_sums = {}
        num_loss_images = 0
        g_pad = 8
        if criterion is not None:
            # one padded GT shape for the whole dataset = one compiled program
            for iid in dataloader.dataset.image_ids:
                ann = dataloader.dataset.get_image_annotation_for_imageid(iid)
                g_pad = max(g_pad, len(ann))
            g_pad = ((g_pad + 7) // 8) * 8

        def _gt_batch(batch_ids_b):
            """Padded device GT for a batch (labels mapped to view-0 rows)."""
            n = batch_size
            gb = np.zeros((n, g_pad, 4), np.float32)
            gl = np.full((n, g_pad), -1, np.int32)
            gd = np.zeros((n, g_pad), bool)
            gv = np.zeros((n, g_pad), bool)
            for i, image_id in enumerate(batch_ids_b):
                gb[i], gl[i], gd[i], gv[i] = padded_gt_for_image(
                    dataloader, image_id, class_ids, num_views, g_pad)
            return {"boxes": gb, "labels": gl, "difficult": gd, "valid": gv}

        def _finalize_losses(batch_ids_b, loss_keys, losses):
            """Blocks on the device-side loss vector (held one step with the
            packed detections so the transfer rides behind the next batch's
            compute) and accumulates per-image sums."""
            nonlocal num_loss_images
            losses = np.asarray(losses)
            for i in range(len(batch_ids_b)):
                for k, key_name in enumerate(loss_keys):
                    loss_sums[key_name] = (
                        loss_sums.get(key_name, 0.0) + float(losses[i, k]))
                num_loss_images += 1

        pending = None
        pending_losses = None
        for (batch_ids, dev_images, level_sizes, inv_scales, initial_sizes) in (
                _prefetched_items()):
            cur_losses = None
            if use_prescreen:
                packed = evaluator.detect_images_prescreened(
                    params, dev_images, class_head, level_sizes,
                    inv_scales[0], img_norm, num_views=num_views,
                )
            elif criterion is not None:
                packed, loss_keys, losses = evaluator.detect_images(
                    params, dev_images, class_head, level_sizes,
                    inv_scales[0], img_norm, num_views=num_views,
                    objective_cfg=criterion, gt=_gt_batch(batch_ids),
                )
                cur_losses = (batch_ids, loss_keys, losses)
            else:
                packed = evaluator.detect_images(
                    params, dev_images, class_head, level_sizes,
                    inv_scales[0], img_norm, num_views=num_views,
                )
            if pending is not None:
                _finalize(*pending)
                if pending_losses is not None:
                    _finalize_losses(*pending_losses)
            pending = (batch_ids, initial_sizes, packed)
            pending_losses = cur_losses
        if pending is not None:
            _finalize(*pending)
            if pending_losses is not None:
                _finalize_losses(*pending_losses)
        return _finish_evaluation(
            predictions, gts, cfg, class_ids, dataset_name, t_start,
            loss_sums, num_loss_images,
            print_per_class_results, logger, image_ids=all_image_ids,
        )

    if use_device_pyramid:
        from .pyramid import device_pyramid

        img_norm = dataloader.img_normalization

        def batches():
            for (batch_ids, base_images, level_sizes, inv_scales,
                 initial_sizes) in dataloader.make_raw_iterator_for_all_images(
                    cfg.eval.batch_size):
                per_image = [
                    device_pyramid(img, level_sizes, img_norm)
                    for img in base_images
                ]
                pyramids = [
                    jnp.concatenate([p[i_lvl] for p in per_image], axis=0)
                    for i_lvl in range(len(level_sizes))
                ]
                yield batch_ids, pyramids, inv_scales, initial_sizes
    else:
        def batches():
            for (batch_ids, pyramids, inv_scales, _, initial_sizes) in (
                    dataloader.make_iterator_for_all_images(cfg.eval.batch_size)):
                yield batch_ids, pyramids, inv_scales, initial_sizes

    predictions = []
    gts = []
    all_image_ids = []
    loss_sums = {}
    num_loss_images = 0
    for batch_ids, pyramids, inverse_scales, initial_sizes in batches():
        level_outputs = evaluator.score_pyramid(params, pyramids, class_head)
        img_sizes = [
            FeatureMapSize(w=p.shape[2], h=p.shape[1]) for p in pyramids
        ]
        for i_image, image_id in enumerate(batch_ids):
            if criterion is not None:
                losses = compute_eval_losses_for_image(
                    level_outputs, i_image, dataloader, image_id, img_sizes,
                    [tuple(s) for s in inverse_scales[i_image]], criterion, cfg,
                    num_views=num_views,
                )
                for k, v in losses.items():
                    loss_sums[k] = loss_sums.get(k, 0.0) + v
                num_loss_images += 1
            out = evaluator.decode_image(
                level_outputs, i_image, img_sizes,
                [tuple(s) for s in inverse_scales[i_image]], num_views,
            )
            boxes = np.asarray(out["boxes"])
            scores = np.asarray(out["scores"])
            valid = np.asarray(out["valid"])

            det_boxes, det_scores, det_labels = [], [], []
            for row in range(boxes.shape[0]):
                m = valid[row]
                det_boxes.append(boxes[row][m])
                det_scores.append(scores[row][m])
                det_labels.append(np.full(int(m.sum()), class_ids[row], np.int64))
            det_boxes = (
                np.concatenate(det_boxes) if det_boxes else np.zeros((0, 4), np.float32)
            )
            det_scores = (
                np.concatenate(det_scores) if det_scores else np.zeros((0,), np.float32)
            )
            det_labels = (
                np.concatenate(det_labels) if det_labels else np.zeros((0,), np.int64)
            )

            init_size = initial_sizes[i_image]
            predictions.append(
                {
                    "boxes": det_boxes,
                    "scores": det_scores,
                    "labels": det_labels,
                    "image_size": (init_size.w, init_size.h),
                }
            )
            all_image_ids.append(image_id)
            _visualize(image_id, det_boxes, det_scores, det_labels)
            _heatmaps(image_id, level_outputs, i_image, img_sizes)
            ann = dataloader.dataset.get_image_annotation_for_imageid(image_id)
            gts.append(
                {
                    "boxes": ann.bbox_xyxy,
                    "labels": ann.get_field("labels"),
                    "difficult": ann.get_field("difficult"),
                    "image_size": (ann.image_size.w, ann.image_size.h),
                }
            )

    return _finish_evaluation(
        predictions, gts, cfg, class_ids, dataset_name, t_start, loss_sums,
        num_loss_images, print_per_class_results, logger,
        image_ids=all_image_ids,
    )


def _finish_evaluation(predictions, gts, cfg, class_ids, dataset_name, t_start,
                       loss_sums, num_loss_images, print_per_class_results,
                       logger, image_ids=None):
    results = {}

    # optional raw-detection dump (reference evaluate.py:136-149; pickle
    # instead of torch.save — everything here is plain numpy)
    save_dir = str(cfg.visualization.eval.get("path_to_save_detections", ""))
    if save_dir:
        import os as _os
        import pickle

        data = {
            "image_ids": list(image_ids) if image_ids is not None else [],
            "boxes_xyxy": [p["boxes"] for p in predictions],
            "labels": [p["labels"] for p in predictions],
            "scores": [p["scores"] for p in predictions],
            "gt_boxes_xyxy": [np.asarray(g["boxes"]) for g in gts],
            "gt_labels": [np.asarray(g["labels"]) for g in gts],
            "gt_difficults": [np.asarray(g["difficult"]) for g in gts],
        }
        _os.makedirs(save_dir, exist_ok=True)
        save_path = _os.path.join(save_dir, f"{dataset_name}_detections.pkl")
        with open(save_path, "wb") as f:
            pickle.dump(data, f)
        logger.info(f"Saved detections to {save_path}")
    for iou_thresh in cfg.eval.mAP_iou_thresholds:
        res = do_voc_evaluation(predictions, gts, iou_thresh=iou_thresh)
        results[f"mAP@{iou_thresh:0.2f}"] = res["map"]
        results[f"mAPw@{iou_thresh:0.2f}"] = res["map_weighted"]
        results[f"recall@{iou_thresh:0.2f}"] = res["recall"]
        results[f"AP_joint_classes@{iou_thresh:0.2f}"] = res["ap_joint_classes"]
        if print_per_class_results:
            for cid in sorted(set(int(c) for c in class_ids)):
                if cid < len(res["ap_per_class"]):
                    results[f"mAP@{iou_thresh:0.2f}_class_{cid}"] = float(
                        res["ap_per_class"][cid]
                    )
        logger.info(
            f"{dataset_name} mAP@{iou_thresh}: {res['map']:0.4f} "
            f"(weighted {res['map_weighted']:0.4f}, recall {res['recall']:0.4f})"
        )

    if num_loss_images:
        for k, v in loss_sums.items():
            results[k] = v / num_loss_images

    results["eval_time"] = time.time() - t_start
    logger.info(f"Evaluation on {dataset_name} took {results['eval_time']:0.2f}s")
    return results

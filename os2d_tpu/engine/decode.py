"""On-device pyramid decoding: loc/cls scores -> final detections.

TPU rebuild of Os2dBoxCoder.decode_pyramid (os2d/modeling/box_coder.py:448-536).
The reference loops in Python over labels and pyramid levels, moving through
dynamically-sized BoxLists; here every label decodes as a vmapped row with
static shapes, survivors are selected with a per-label pre-top-K, and greedy
NMS runs on device. Inverse transforms back to original image coordinates are
per-level (sx, sy) scalings — the eval pyramid is built with pure resizes
(os2d/data/dataloader.py:432-476), so the inverse is linear.

Labels with test-time-augmented class views (rotation90/horflip,
os2d/engine/evaluate.py:241-269) should be pre-merged by the caller into one
row per real class (concatenating their anchors), since the reference NMS-es
views of the same class jointly (box_coder.py:483-527).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.head import ANCHOR_BOX, ANCHOR_STRIDE
from ..ops.nms import nms_topk
from ..structures.boxes import (
    clip_boxes_to_image,
    decode_boxes,
    mask_empty_boxes,
    strided_anchor_grid,
)
from ..structures.feature_map import FeatureMapSize, feature_map_size_for_image


def default_boxes_for_image_size(img_size: FeatureMapSize):
    """Anchor grid (240x240 @ stride 16) for an image size
    (os2d/modeling/box_coder.py:191-203)."""
    fm = feature_map_size_for_image(img_size)
    return strided_anchor_grid(
        fm.w, fm.h,
        float(ANCHOR_BOX.w), float(ANCHOR_BOX.h),
        float(ANCHOR_STRIDE.w), float(ANCHOR_STRIDE.h),
    )


def decode_single_level(loc_scores, cls_scores, default_boxes, img_size_wh,
                        inverse_scale_xy, score_threshold):
    """Decode one pyramid level for a batch of label rows.

    Args:
      loc_scores: [G, 4, A] localization outputs.
      cls_scores: [G, A] recognition scores.
      default_boxes: [A, 4] anchors at this level's image size.
      img_size_wh: (w, h) of this level (static ints).
      inverse_scale_xy: (sx, sy) scaling back to original image coordinates.
      score_threshold: drop boxes scoring <= threshold (reference default -inf).

    Returns (boxes [G, A, 4] in ORIGINAL coords, scores [G, A], valid [G, A]).
    """
    g = loc_scores.shape[0]
    loc = loc_scores.transpose(0, 2, 1)  # [G, A, 4]
    boxes = decode_boxes(loc, default_boxes[None])  # [G, A, 4]
    boxes = clip_boxes_to_image(boxes, float(img_size_wh[0]), float(img_size_wh[1]))
    bad = mask_empty_boxes(boxes)
    valid = (cls_scores > score_threshold) & (~bad)
    sx, sy = inverse_scale_xy
    boxes = boxes * jnp.asarray([sx, sy, sx, sy], boxes.dtype)
    return boxes, cls_scores, valid


def decode_pyramid(
    loc_pyramid: Sequence[jnp.ndarray],
    cls_pyramid: Sequence[jnp.ndarray],
    img_sizes: Sequence[FeatureMapSize],
    inverse_scales: Sequence[Tuple[float, float]],
    *,
    nms_iou_threshold: float = 0.3,
    score_threshold: float = float("-inf"),
    pre_top_k: int = 1024,
    top_k: int = 256,
    nms_across_classes: bool = False,
    corners_pyramid: Optional[Sequence[jnp.ndarray]] = None,
):
    """Decode all pyramid levels and NMS per label row (jit-compatible).

    Args:
      loc_pyramid: per level [G, 4, A_l]; cls_pyramid per level [G, A_l].
      img_sizes: per-level image sizes (static).
      inverse_scales: per-level (sx, sy) back to original coordinates.
      pre_top_k: per-label candidate cap before NMS (reference keeps all
        anchors; scores are in [-1, 1] and instances per image are few, so a
        generous cap is lossless in practice — raise for strict parity runs).
      top_k: detections kept per label row after NMS.

    Returns dict with boxes [G, K, 4] (original coords), scores [G, K],
      valid [G, K]; plus corners [G, K, 8] if corners_pyramid given. If
      nms_across_classes, a second NMS joins all rows (the arrays keep the same
      shape; suppressed entries get valid=False).
    """
    num_levels = len(loc_pyramid)
    all_boxes, all_scores, all_valid, all_corners = [], [], [], []
    for lvl in range(num_levels):
        img_size = img_sizes[lvl]
        d_boxes = default_boxes_for_image_size(img_size)
        boxes, scores, valid = decode_single_level(
            loc_pyramid[lvl],
            cls_pyramid[lvl],
            d_boxes,
            (img_size.w, img_size.h),
            inverse_scales[lvl],
            score_threshold,
        )
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_valid.append(valid)
        if corners_pyramid is not None:
            sx, sy = inverse_scales[lvl]
            c = corners_pyramid[lvl].transpose(0, 2, 1)  # [G, A, 8]
            c = c * jnp.tile(jnp.asarray([sx, sy], c.dtype), 4)
            all_corners.append(c)

    boxes = jnp.concatenate(all_boxes, axis=1)  # [G, A_tot, 4]
    scores = jnp.concatenate(all_scores, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)
    corners = jnp.concatenate(all_corners, axis=1) if corners_pyramid is not None else None

    # per-label candidate cap (scores of invalid candidates -> -inf)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    capped = jnp.where(valid, scores, neg_inf)
    k_pre = min(pre_top_k, capped.shape[1])
    top_scores, top_idx = jax.lax.top_k(capped, k_pre)  # [G, k_pre]
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_valid = jnp.take_along_axis(valid, top_idx, axis=1)
    top_corners = (
        jnp.take_along_axis(corners, top_idx[..., None], axis=1)
        if corners is not None
        else None
    )

    def _nms_row(b, s, v):
        return nms_topk(b, s, v, nms_iou_threshold, top_k)

    nb, ns, nv, nidx = jax.vmap(_nms_row)(top_boxes, top_scores, top_valid)
    out = {"boxes": nb, "scores": ns, "valid": nv}
    if top_corners is not None:
        out["corners"] = jnp.take_along_axis(top_corners, nidx[..., None], axis=1)

    if nms_across_classes:
        g, k, _ = nb.shape
        fb = nb.reshape(g * k, 4)
        fs = ns.reshape(g * k)
        fv = nv.reshape(g * k)
        from ..ops.nms import nms_keep_mask

        keep = nms_keep_mask(fb, fs, fv, nms_iou_threshold)
        out["valid"] = keep.reshape(g, k)
    return out

"""Pure-array box geometry for the TPU compute path.

Everything here is shape-static jnp code usable under jit/vmap/pjit. Semantics
match the kernels the reference imports from torchvision
(os2d/structures/bounding_box.py:4-5, os2d/modeling/box_coder.py:7):
  - box_iou / box_area / clip_boxes_to_image (torchvision.ops.boxes)
  - encode_boxes / BoxCoder.decode_single   (torchvision detection _utils)
  - Matcher(high, low, allow_low_quality_matches=False)

Boxes are float32 [..., 4] in xyxy. Padded entries are handled with validity
masks rather than dynamic shapes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

# SSD-style encoding weights (os2d/modeling/box_coder.py:13).
BOX_ENCODING_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
# torchvision BoxCoder bbox_xform_clip: clamp on dw/dh before exp in decode.
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def box_area(boxes):
    """Area of xyxy boxes [..., 4] (no +1 convention, as torchvision)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1, boxes2):
    """IoU matrix between boxes1 [N, 4] and boxes2 [M, 4] -> [N, M]."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def box_intersection_over_reference(boxes_reference, boxes):
    """intersection(ref, box) / area(ref) -> [N, M].

    Coverage ratio used by the crop augmentation
    (os2d/structures/bounding_box.py:324-342).
    """
    area_ref = box_area(boxes_reference)
    lt = jnp.maximum(boxes_reference[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes_reference[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]
    safe = jnp.where(area_ref > 0, area_ref, 1.0)
    return jnp.where(area_ref[:, None] > 0, inter / safe[:, None], 0.0)


def clip_boxes_to_image(boxes, img_w, img_h):
    """Clamp xyxy boxes into [0, w] x [0, h] (torchvision clip_boxes_to_image)."""
    x1 = jnp.clip(boxes[..., 0], 0.0, img_w)
    y1 = jnp.clip(boxes[..., 1], 0.0, img_h)
    x2 = jnp.clip(boxes[..., 2], 0.0, img_w)
    y2 = jnp.clip(boxes[..., 3], 0.0, img_h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def mask_empty_boxes(boxes):
    """True for degenerate boxes (os2d/structures/bounding_box.py:279-281)."""
    return (boxes[..., 3] <= boxes[..., 1]) | (boxes[..., 2] <= boxes[..., 0])


def clip_to_min_size(boxes, min_size=1.0):
    """Force every side >= min_size, keeping the top-left corner fixed.

    Mirrors BoxList.clip_to_min_size (os2d/structures/bounding_box.py:267-277)
    including its gradient semantics: in the clamped branch gradients flow
    through neither coordinate (the reference detaches x1 and sets x2 = x1+1).
    Guards against NaN in the log of encode_boxes.
    """
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    need_w = (x1 + min_size) > x2
    x1c = jnp.where(need_w, lax.stop_gradient(x1), x1)
    x2c = jnp.where(need_w, lax.stop_gradient(x1) + min_size, x2)
    need_h = (y1 + min_size) > y2
    y1c = jnp.where(need_h, lax.stop_gradient(y1), y1)
    y2c = jnp.where(need_h, lax.stop_gradient(y1) + min_size, y2)
    return jnp.stack([x1c, y1c, x2c, y2c], axis=-1)


def encode_boxes(gt_boxes, anchors, weights=BOX_ENCODING_WEIGHTS):
    """torchvision encode_boxes: regression targets of gt w.r.t. anchors.

    Both inputs [..., 4] xyxy, broadcastable. Returns [..., 4] =
    (wx*(dcx)/aw, wy*(dcy)/ah, ww*log(gw/aw), wh*log(gh/ah)).
    """
    wx, wy, ww, wh = weights
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    acx = anchors[..., 0] + 0.5 * aw
    acy = anchors[..., 1] + 0.5 * ah
    gw = gt_boxes[..., 2] - gt_boxes[..., 0]
    gh = gt_boxes[..., 3] - gt_boxes[..., 1]
    gcx = gt_boxes[..., 0] + 0.5 * gw
    gcy = gt_boxes[..., 1] + 0.5 * gh
    tx = wx * (gcx - acx) / aw
    ty = wy * (gcy - acy) / ah
    tw = ww * jnp.log(gw / aw)
    th = wh * jnp.log(gh / ah)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode_boxes(rel_codes, anchors, weights=BOX_ENCODING_WEIGHTS):
    """torchvision BoxCoder.decode_single: rel codes + anchors -> xyxy boxes.

    Includes the bbox_xform_clip=log(1000/16) clamp on dw/dh.
    """
    wx, wy, ww, wh = weights
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    acx = anchors[..., 0] + 0.5 * aw
    acy = anchors[..., 1] + 0.5 * ah
    dx = rel_codes[..., 0] / wx
    dy = rel_codes[..., 1] / wy
    dw = jnp.clip(rel_codes[..., 2] / ww, max=BBOX_XFORM_CLIP)
    dh = jnp.clip(rel_codes[..., 3] / wh, max=BBOX_XFORM_CLIP)
    pcx = dx * aw + acx
    pcy = dy * ah + acy
    pw = jnp.exp(dw) * aw
    ph = jnp.exp(dh) * ah
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )


def match_anchors(ious, gt_valid, gt_difficult, high_threshold, low_threshold):
    """torchvision Matcher + difficult handling, padded-GT aware.

    Args:
      ious: [G, A] IoU of (padded) GT rows vs anchors.
      gt_valid: [G] bool, False for padding rows.
      gt_difficult: [G] bool, difficult flags.
      high_threshold / low_threshold: Matcher thresholds.

    Returns:
      index [A] int32: >=0 matched GT id; -1 below low (negative);
        -2 between thresholds OR matched to a difficult GT (ignore)
        (os2d/modeling/box_coder.py:212-232).
      max_iou [A] float: IoU with best valid GT.
    """
    neg_inf = jnp.asarray(-1.0, ious.dtype)
    masked = jnp.where(gt_valid[:, None], ious, neg_inf)
    matched_vals = jnp.max(masked, axis=0)
    matches = jnp.argmax(masked, axis=0).astype(jnp.int32)
    below = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)
    index = jnp.where(below, -1, jnp.where(between, -2, matches))
    # anchors positively matched to difficult GT -> ignore (-2)
    matched_difficult = gt_difficult[jnp.clip(matches, 0, None)]
    index = jnp.where((index >= 0) & matched_difficult, -2, index)
    max_iou = jnp.clip(matched_vals, min=0.0)
    return index, max_iou


def convert_boxes(boxes, src: str, dst: str):
    """Convert between 'xyxy', 'xywh', 'cx_cy_w_h' formats ([..., 4])."""
    if src == dst:
        return boxes
    if src == "xyxy":
        xyxy = boxes
    elif src == "xywh":
        x, y, w, h = jnp.split(boxes, 4, axis=-1)
        xyxy = jnp.concatenate([x, y, x + w, y + h], axis=-1)
    elif src == "cx_cy_w_h":
        cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
        xyxy = jnp.concatenate(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
        )
    else:
        raise ValueError(f"unknown box format {src}")
    if dst == "xyxy":
        return xyxy
    x1, y1, x2, y2 = jnp.split(xyxy, 4, axis=-1)
    if dst == "xywh":
        return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)
    if dst == "cx_cy_w_h":
        return jnp.concatenate(
            [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
        )
    raise ValueError(f"unknown box format {dst}")


def strided_anchor_grid(fm_w: int, fm_h: int, box_w: float, box_h: float,
                        stride_w: float, stride_h: float):
    """Anchor grid in xyxy, row-major over (h, w): anchor a = y*fm_w + x.

    Centers at ((x+0.5)*stride_w, (y+0.5)*stride_h) with a fixed box size.
    Port of create_strided_boxes_columnfirst (os2d/modeling/box_coder.py:16-60).
    Returns [fm_h*fm_w, 4] float32.
    """
    ys = (jnp.arange(fm_h, dtype=jnp.float32) + 0.5) * stride_h
    xs = (jnp.arange(fm_w, dtype=jnp.float32) + 0.5) * stride_w
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
    cx = cx.reshape(-1)
    cy = cy.reshape(-1)
    half_w = box_w / 2.0
    half_h = box_h / 2.0
    return jnp.stack([cx - half_w, cy - half_h, cx + half_w, cy + half_h], axis=1)


def filter_detections(boxes, scores, score_threshold=0.0, max_dets=None):
    """Top-scoring detections above a threshold (host-side numpy).

    Port of filter_bbox (os2d/structures/bounding_box.py:420-436) on plain
    arrays: returns (scores, boxes) sorted by descending score.
    """
    import numpy as np

    boxes = np.asarray(boxes).reshape(-1, 4)
    scores = np.asarray(scores).reshape(-1)
    good = np.nonzero(scores > score_threshold)[0]
    if good.size == 0:
        return np.zeros((0,), np.float32), np.zeros((0, 4), np.float32)
    order = good[np.argsort(-scores[good], kind="stable")]
    if max_dets is not None:
        order = order[:max_dets]
    return scores[order], boxes[order]

"""Target assignment: anchor encoding and post-forward target remapping.

TPU rebuild of Os2dBoxCoder.encode / remap_anchor_targets
(os2d/modeling/box_coder.py:234-422). The reference iterates Python loops over
images x labels on dynamically-shaped GT BoxLists; here GT arrives padded to a
static [G, 4] with validity masks and everything vmaps, so the whole train-step
(forward + remap + loss) compiles into one XLA program.

Class targets use the reference's value coding: 1 positive, 0 negative,
-1 ignore (difficult or between-threshold IoU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..structures.boxes import (
    box_iou,
    clip_to_min_size,
    decode_boxes,
    encode_boxes,
    match_anchors,
)


def encode_targets_single_image(
    gt_boxes,      # [G, 4] xyxy (padded)
    gt_labels,     # [G] int32 local label ids (padded with -1)
    gt_difficult,  # [G] bool
    gt_valid,      # [G] bool
    default_boxes,  # [A, 4]
    num_labels: int,
    positive_iou_threshold: float = 0.5,
    negative_iou_threshold: float = 0.1,
):
    """Per-image target encoding (os2d/modeling/box_coder.py:332-394).

    Returns:
      loc_targets [num_labels, 4, A], cls_targets [num_labels, A] int32.
    """
    ious = box_iou(gt_boxes, default_boxes)  # [G, A]
    anchors = clip_to_min_size(default_boxes, 1.0)

    def per_label(label):
        valid_l = gt_valid & (gt_labels == label)
        index, _ = match_anchors(
            ious, valid_l, gt_difficult, positive_iou_threshold, negative_iou_threshold
        )
        # unmatched anchors get a dummy box — the reference uses the first box
        # OF THIS LABEL (box_coder.py:374); these entries are masked out of the
        # localization loss but are reproduced for parity
        first_of_label = jnp.argmax(valid_l)
        matched = gt_boxes[jnp.where(index >= 0, index, first_of_label)]
        matched = clip_to_min_size(matched, 1.0)
        loc = encode_boxes(matched, anchors)  # [A, 4]
        cls = (1 + jnp.clip(index, -2, 0)).astype(jnp.int32)
        has_gt = jnp.any(valid_l)
        loc = jnp.where(has_gt, loc, jnp.zeros_like(loc))
        cls = jnp.where(has_gt, cls, jnp.zeros_like(cls))
        return loc.T, cls  # [4, A], [A]

    loc_t, cls_t = jax.vmap(per_label)(jnp.arange(num_labels))
    return loc_t, cls_t


def remap_targets(
    loc_scores,    # [B, L, 4, A] predicted localization
    gt_boxes,      # [B, G, 4]
    gt_labels,     # [B, G]
    gt_difficult,  # [B, G] bool
    gt_valid,      # [B, G] bool
    default_boxes,  # [A, 4] (same image size across the batch at training)
    remap_iou_pos: float = 0.8,
    remap_iou_neg: float = 0.4,
):
    """Post-forward classification-target remapping
    (os2d/modeling/box_coder.py:234-303): decode the predicted boxes and
    re-match them to GT at stricter IoUs so classification targets reflect
    where the ALIGNED boxes land.

    Returns:
      cls_targets_remapped [B, L, A] int32,
      ious_anchor [B, L, A] (anchor-vs-GT IoU),
      ious_anchor_corrected [B, L, A] (decoded-box-vs-GT IoU).
    """

    def per_image(loc_im, boxes_im, labels_im, diff_im, valid_im):
        ious_anchor_gt = box_iou(boxes_im, default_boxes)  # [G, A]

        def per_label(label, loc_l):
            pred_boxes = decode_boxes(loc_l.T, default_boxes)  # [A, 4]
            valid_l = valid_im & (labels_im == label)
            ious_pred_gt = box_iou(boxes_im, pred_boxes)  # [G, A]
            index, _ = match_anchors(
                ious_pred_gt, valid_l, diff_im, remap_iou_pos, remap_iou_neg
            )
            cls = (1 + jnp.clip(index, -2, 0)).astype(jnp.int32)
            neg_inf = jnp.asarray(-1.0, ious_pred_gt.dtype)
            masked_pred = jnp.where(valid_l[:, None], ious_pred_gt, neg_inf)
            masked_anchor = jnp.where(valid_l[:, None], ious_anchor_gt, neg_inf)
            iou_corr = jnp.clip(jnp.max(masked_pred, axis=0), min=0.0)
            iou_anch = jnp.clip(jnp.max(masked_anchor, axis=0), min=0.0)
            has_gt = jnp.any(valid_l)
            zero = jnp.zeros_like(cls)
            return (
                jnp.where(has_gt, cls, zero),
                jnp.where(has_gt, iou_anch, jnp.zeros_like(iou_anch)),
                jnp.where(has_gt, iou_corr, jnp.zeros_like(iou_corr)),
            )

        labels = jnp.arange(loc_im.shape[0])
        return jax.vmap(per_label)(labels, loc_im)

    cls_r, iou_a, iou_c = jax.vmap(per_image)(
        loc_scores, gt_boxes, gt_labels, gt_difficult, gt_valid
    )
    return cls_r, iou_a, iou_c

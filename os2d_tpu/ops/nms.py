"""On-device non-maximum suppression with static shapes.

TPU replacement for torchvision.ops.nms (CUDA) as used by the reference's
chunked-NMS wrapper (os2d/structures/bounding_box.py:344-387). Instead of
dynamic survivor sets, boxes are score-sorted and a greedy keep mask is
computed by iterating a suppression relation to its fixpoint — the fixpoint
equals exact greedy (score-descending) NMS, and the iteration finalizes at
least one more prefix position per sweep, so it terminates in <= K sweeps
(typically a handful).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.boxes import box_iou


def nms_keep_mask(boxes, scores, valid, iou_threshold: float,
                  dense_limit: int = 8192, block: int = 2048):
    """Greedy NMS keep mask over up to K boxes.

    Args:
      boxes: [K, 4] xyxy.
      scores: [K] floats (ties broken by input order, as torch sort is stable).
      valid: [K] bool; invalid boxes are never kept and never suppress.
      iou_threshold: suppress j if IoU(i, j) > threshold for a kept i with
        higher score (strict >, as torchvision).
      dense_limit: above this K the [K, K] suppression relation is no longer
        materialized; score-sorted blocks finalize sequentially (prior kept
        boxes suppress forward in [K, block] IoU tiles, a dense fixpoint
        resolves each block internally) — identical greedy semantics, one
        O(K^2) IoU pass, O(K*block) peak memory. The dense form OOMs at
        exact-parity full scale — K = all 39580 pyramid anchors made the
        batched [G, K, K] relation a >100 GB allocation, and a global tiled
        fixpoint was measured hours-slow there (sweep count grows with the
        suppression-chain depth of dense anchor grids).

    Returns:
      keep [K] bool in the ORIGINAL box order.
    """
    k = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg_inf)
    # stable descending sort by score
    order = jnp.argsort(-masked_scores, stable=True)
    sboxes = boxes[order]
    svalid = valid[order]

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    if k <= dense_limit:
        iou = box_iou(sboxes, sboxes)
        higher = jnp.tril(jnp.ones((k, k), dtype=bool), k=-1).T  # [i, j]: i < j
        suppress = (iou > iou_threshold) & higher & svalid[:, None] & svalid[None, :]

        def body(state):
            keep, _, it = state
            suppressed = jnp.any(suppress & keep[:, None], axis=0)
            new_keep = svalid & ~suppressed
            return new_keep, keep, it + 1

        keep0 = svalid
        keep, _, _ = jax.lax.while_loop(
            cond, body, (keep0, jnp.zeros_like(keep0), jnp.asarray(0))
        )
    else:
        # Score-ordered block-sequential greedy: blocks of the sorted
        # candidates finalize in order — every prior-block KEPT box (all
        # strictly-higher-ranked) suppresses forward into the current block
        # in one [K, block] IoU pass, then a dense fixpoint resolves the
        # within-block chains on [block, block]. Exactly sequential greedy,
        # ONE O(K^2) IoU pass total — unlike a global fixpoint, whose sweep
        # count grows with the suppression-chain depth (dense anchor grids
        # at full scale produced chains deep enough for hours of CPU time).
        n_blocks = (k + block - 1) // block
        k_pad = n_blocks * block
        pad = k_pad - k
        sboxes_p = jnp.pad(sboxes, ((0, pad), (0, 0)))
        svalid_p = jnp.pad(svalid, (0, pad))
        higher_local = jnp.tril(jnp.ones((block, block), dtype=bool), k=-1).T

        def process_block(keep_p, b):
            jb = jax.lax.dynamic_slice(sboxes_p, (b * block, 0), (block, 4))
            jv = jax.lax.dynamic_slice(svalid_p, (b * block,), (block,))
            # suppression from already-finalized higher-score blocks (keep_p
            # is False at this block and beyond, so no i<j test is needed)
            iou_prior = box_iou(sboxes_p, jb)  # [k_pad, block]
            sup_prior = jnp.any(
                (iou_prior > iou_threshold) & keep_p[:, None], axis=0)
            lvalid = jv & ~sup_prior
            # within-block greedy via the dense fixpoint
            iou_l = box_iou(jb, jb)
            suppress_l = ((iou_l > iou_threshold) & higher_local
                          & lvalid[:, None] & lvalid[None, :])

            def lcond(state):
                lkeep, lprev, it = state
                return jnp.logical_and(jnp.any(lkeep != lprev), it < block)

            def lbody(state):
                lkeep, _, it = state
                sup = jnp.any(suppress_l & lkeep[:, None], axis=0)
                return lvalid & ~sup, lkeep, it + 1

            lkeep, _, _ = jax.lax.while_loop(
                lcond, lbody,
                (lvalid, jnp.zeros_like(lvalid), jnp.asarray(0)))
            keep_p = jax.lax.dynamic_update_slice(keep_p, lkeep, (b * block,))
            return keep_p, None

        keep_p, _ = jax.lax.scan(
            process_block, jnp.zeros(k_pad, bool), jnp.arange(n_blocks))
        keep = keep_p[:k]

    # scatter back to original order
    out = jnp.zeros_like(keep).at[order].set(keep)
    return out


def nms_topk(boxes, scores, valid, iou_threshold: float, top_k: int):
    """NMS then return the top_k survivors sorted by descending score.

    Returns (boxes [top_k, 4], scores [top_k], valid [top_k], indices [top_k]).
    Padded slots have valid=False and score=-inf.
    """
    keep = nms_keep_mask(boxes, scores, valid, iou_threshold)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    kept_scores = jnp.where(keep, scores, neg_inf)
    if top_k > boxes.shape[0]:
        pad = top_k - boxes.shape[0]
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)], axis=0)
        kept_scores = jnp.concatenate(
            [kept_scores, jnp.full((pad,), neg_inf, scores.dtype)], axis=0
        )
        keep = jnp.concatenate([keep, jnp.zeros((pad,), bool)], axis=0)
    top_scores, top_idx = jax.lax.top_k(kept_scores, top_k)
    top_boxes = boxes[top_idx]
    top_valid = keep[top_idx]
    top_scores = jnp.where(top_valid, top_scores, neg_inf)
    return top_boxes, top_scores, top_valid, top_idx

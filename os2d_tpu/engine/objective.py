"""Training objective: recognition loss (RLL / ContrastiveLoss) + smooth-L1.

jnp port of Os2dObjective (os2d/engine/objective.py:12-313) with identical
semantics: target coding {1 pos, 0 neg, -1 ignore}, optional remapped
classification targets (localization keeps the originals), detached-transform
scores on negatives, RLL per-label temperature + negative re-weighting,
sort-rank hard-negative mining for the contrastive loss, and num_pos
normalization. Fully vectorized — usable inside a jitted train step.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ObjectiveConfig:
    class_loss: str = "RLL"  # "RLL" | "ContrastiveLoss"
    margin: float = 0.5  # negative margin
    margin_pos: float = 0.6
    class_loss_neg_weight: float = 1.0
    remap_classification_targets: bool = True
    localization_weight: float = 0.2
    neg_to_pos_ratio: float = 3.0
    rll_neg_weight_ratio: float = 0.001

    @property
    def effective_neg_to_pos_ratio(self):
        # RLL disables further hard-negative mining (objective.py:42-44)
        return float("inf") if self.class_loss.lower() == "rll" else self.neg_to_pos_ratio


def smooth_l1(x, y):
    """F.smooth_l1_loss(reduction='none'), beta=1."""
    d = x - y
    ad = jnp.abs(d)
    return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)


def _where(mask, a, fill=0.0):
    return jnp.where(mask, a, jnp.asarray(fill, a.dtype))


def _hard_negative_ranking(cls_loss, mask_for_search):
    """Global sort-rank of negatives (objective.py:47-71): rank 0 = largest
    loss among the searchable mask; masked-out entries rank after all
    searchable ones."""
    flat_loss = cls_loss.reshape(-1)
    flat_mask = mask_for_search.reshape(-1)
    neg_loss = -flat_loss
    max_neg = jnp.max(neg_loss)
    neg_loss = jnp.where(flat_mask, neg_loss, max_neg + 1)
    idx = jnp.argsort(neg_loss, stable=True)
    rank = jnp.argsort(idx, stable=True)
    return rank.reshape(cls_loss.shape)


def compute_objective(
    cfg: ObjectiveConfig,
    loc_preds,  # [B, L, 4, A] or None
    loc_targets,  # [B, L, 4, A]
    cls_preds,  # [B, L, A]
    cls_targets,  # [B, L, A] in {1, 0, -1}
    cls_targets_remapped=None,  # [B, L, A] or None
    cls_preds_for_neg=None,  # [B, L, A] or None
    patch_mining_mode: bool = False,
    want_per_anchor: bool = False,
):
    """Returns (losses dict, per_anchor dict or None).

    `want_per_anchor` returns the per-anchor maps without switching to the
    mining-mode loss semantics (used by the remapping diagnostics,
    reference os2d/utils/visualization.py:99-101).

    Pyramid inputs should be pre-concatenated along the anchor axis by the
    caller (the reference's merge_pyramids, objective.py:88-105).
    """
    pos = cls_targets > 0
    mask_ignored = cls_targets == -1
    neg = ~(mask_ignored | pos)
    num_pos = jnp.sum(pos)

    flag_remap = cls_targets_remapped is not None and cfg.remap_classification_targets
    pos_for_regression = pos
    num_pos_for_regression = num_pos
    if cls_targets_remapped is not None and flag_remap:
        pos = cls_targets_remapped > 0
        mask_ignored = cls_targets_remapped == -1
        neg = ~(mask_ignored | pos)
        num_pos = jnp.sum(pos)

    if cls_preds_for_neg is not None:
        cls_preds = _where(pos, cls_preds) + _where(neg, cls_preds_for_neg)

    # ---- localization ----
    loc_loss_per_element = jnp.sum(smooth_l1(loc_preds, loc_targets), axis=2)
    loc_loss_per_element = _where(pos_for_regression, loc_loss_per_element)
    loc_loss = jnp.sum(loc_loss_per_element)

    # ---- recognition ----
    loss_neg = 0.5 * jnp.clip(cls_preds - cfg.margin, min=0.0)
    loss_pos = 0.5 * jnp.clip(cfg.margin_pos - cls_preds, min=0.0)
    loss_neg = _where(neg, loss_neg)
    loss_pos = _where(pos, loss_pos)

    if cfg.class_loss == "ContrastiveLoss":
        cls_loss = jnp.square(loss_neg) + jnp.square(loss_pos)
    elif cfg.class_loss == "RLL":
        if not patch_mining_mode:
            # positives: renormalize by the non-trivial count (objective.py:218-224)
            mask_nontrivial_pos = (loss_pos > 0) & pos
            num_nontrivial_pos = jnp.sum(mask_nontrivial_pos.astype(jnp.float32))
            loss_pos = jnp.where(
                num_nontrivial_pos > 0,
                loss_pos * (num_pos / jnp.maximum(num_nontrivial_pos, 1.0)),
                jnp.zeros_like(loss_pos),
            )

            # negatives: exp weights with per-label temperature (objective.py:226-246)
            mask_nontrivial_negs = (loss_neg > 0) & neg
            loss_neg_detached = jax.lax.stop_gradient(loss_neg)
            max_loss_neg_per_label = jnp.max(
                jnp.max(loss_neg_detached, axis=2, keepdims=True), axis=0, keepdims=True
            )  # [1, L, 1]
            mask_positive_neg_loss_per_label = max_loss_neg_per_label > 1e-5
            rll_temperature = -math.log(cfg.rll_neg_weight_ratio) / jnp.maximum(
                max_loss_neg_per_label, 1e-20
            )
            rll_temperature = _where(mask_positive_neg_loss_per_label, rll_temperature)

            weights_negs = (
                jnp.exp((loss_neg_detached - max_loss_neg_per_label) * rll_temperature)
                * mask_nontrivial_negs.astype(loss_neg.dtype)
            )
            weights_negs_normalization = jnp.sum(
                jnp.sum(weights_negs, axis=2, keepdims=True), axis=0, keepdims=True
            )  # [1, L, 1]
            num_active_labels = jnp.sum(
                mask_positive_neg_loss_per_label.astype(loss_neg.dtype)
            )
            weights_negs_normalization = 1.0 / jnp.maximum(
                weights_negs_normalization * num_active_labels, 1e-30
            )
            weights_negs_normalization = jnp.where(
                (weights_negs_normalization <= 1e-8)
                | (~mask_positive_neg_loss_per_label),
                0.0,
                weights_negs_normalization,
            )
            weights_negs = _where(
                jnp.broadcast_to(mask_positive_neg_loss_per_label, weights_negs.shape),
                weights_negs,
            )
            weights_negs = weights_negs * weights_negs_normalization

            weights_negs = weights_negs * jnp.maximum(num_pos, 1).astype(
                weights_negs.dtype
            )
            weight_mask = weights_negs > 1e-8
            loss_neg = _where(weight_mask, loss_neg) * weights_negs

        loss_neg = _where(neg, loss_neg)
        loss_pos = _where(pos, loss_pos)
        cls_loss = loss_neg + loss_pos
    else:
        raise ValueError(f"Unknown class_loss: {cfg.class_loss}")

    mask_all_negs = ~(mask_ignored | pos)
    if not patch_mining_mode:
        ratio = cfg.effective_neg_to_pos_ratio
        if math.isinf(ratio):
            # RLL: keep ALL negatives. Note the reference reaches this via
            # float('inf').long() (objective.py:82-83), which saturates to
            # INT64_MAX on CUDA (all negatives kept — the semantics the
            # released models were trained with) but wraps to INT64_MIN on
            # CPU (no negatives). We implement the intended / GPU behavior.
            neg = mask_all_negs
        else:
            ranking = _hard_negative_ranking(cls_loss, mask_all_negs)
            num_neg = ratio * num_pos
            neg = (ranking < num_neg) & mask_all_negs

    cls_loss_per_element = cls_loss
    cls_loss_pos = jnp.sum(_where(pos, cls_loss))
    cls_loss_neg = jnp.sum(_where(neg, cls_loss))

    num_pos_safe = jnp.maximum(num_pos, 1).astype(cls_loss.dtype)
    num_pos_reg_safe = jnp.maximum(num_pos_for_regression, 1).astype(cls_loss.dtype)

    loc_loss = loc_loss / num_pos_reg_safe
    cls_loss_pos = cls_loss_pos / num_pos_safe
    cls_loss_neg = cls_loss_neg / num_pos_safe

    cls_loss_total = cls_loss_pos + cls_loss_neg * cfg.class_loss_neg_weight
    loss = cls_loss_total + loc_loss * cfg.localization_weight

    cls_name = "cls_" + cfg.class_loss
    if not math.isinf(cfg.effective_neg_to_pos_ratio):
        suffix = f"_hardneg{cfg.neg_to_pos_ratio}"
    else:
        suffix = ""
    losses = {
        "loss": loss,
        "loc_smoothL1": loc_loss,
        cls_name + suffix: cls_loss_total,
        cls_name + "_pos": cls_loss_pos,
        cls_name + "_neg" + suffix: cls_loss_neg,
    }

    per_anchor = None
    if patch_mining_mode or want_per_anchor:
        per_anchor = {
            "pos_mask": pos,
            "neg_mask": neg,
            "cls_loss": jax.lax.stop_gradient(cls_loss_per_element),
            "loc_loss": jax.lax.stop_gradient(loc_loss_per_element),
            "pos_for_regression": pos_for_regression,
        }
    return losses, per_anchor

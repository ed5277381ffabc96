"""Golden tests: jnp objective vs the executed reference Os2dObjective."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from reference_oracle import import_reference

import_reference()

from os2d.engine.objective import Os2dObjective  # noqa: E402

from os2d_tpu.engine.objective import ObjectiveConfig, compute_objective  # noqa: E402


def make_inputs(rng, b=2, l=3, a=50):
    loc_preds = (rng.randn(b, l, 4, a) * 0.5).astype(np.float32)
    loc_targets = (rng.randn(b, l, 4, a) * 0.5).astype(np.float32)
    cls_preds = rng.uniform(-1, 1, (b, l, a)).astype(np.float32)
    cls_targets = rng.choice([1, 0, 0, 0, -1], size=(b, l, a)).astype(np.int64)
    cls_remapped = rng.choice([1, 0, 0, 0, -1], size=(b, l, a)).astype(np.int64)
    cls_preds_neg = rng.uniform(-1, 1, (b, l, a)).astype(np.float32)
    return loc_preds, loc_targets, cls_preds, cls_targets, cls_remapped, cls_preds_neg


@pytest.mark.parametrize("class_loss", ["RLL", "ContrastiveLoss"])
@pytest.mark.parametrize("use_remap", [True, False])
@pytest.mark.parametrize("use_neg_preds", [True, False])
def test_objective_matches_reference(class_loss, use_remap, use_neg_preds):
    rng = np.random.RandomState(hash((class_loss, use_remap, use_neg_preds)) % 2**31)
    loc_p, loc_t, cls_p, cls_t, cls_r, cls_pn = make_inputs(rng)

    ref = Os2dObjective(
        class_loss=class_loss,
        margin=0.5,
        margin_pos=0.6,
        class_loss_neg_weight=1.0,
        remap_classification_targets=use_remap,
        localization_weight=0.2,
        neg_to_pos_ratio=3,
        rll_neg_weight_ratio=0.001,
    )
    if class_loss == "RLL":
        # the reference sets neg_to_pos_ratio=inf for RLL; on CPU torch,
        # inf.long() wraps NEGATIVE (keeping no negatives), while on the CUDA
        # the models were trained on it saturates (keeping all). Emulate the
        # intended/GPU behavior in the oracle with a huge finite ratio.
        ref.neg_to_pos_ratio = float(2**40)
    want = ref(
        torch.as_tensor(loc_p),
        torch.as_tensor(loc_t),
        torch.as_tensor(cls_p),
        torch.as_tensor(cls_t),
        cls_targets_remapped=torch.as_tensor(cls_r),
        cls_preds_for_neg=torch.as_tensor(cls_pn) if use_neg_preds else None,
    )

    cfg = ObjectiveConfig(
        class_loss=class_loss,
        margin=0.5,
        margin_pos=0.6,
        class_loss_neg_weight=1.0,
        remap_classification_targets=use_remap,
        localization_weight=0.2,
        neg_to_pos_ratio=3,
        rll_neg_weight_ratio=0.001,
    )
    got, _ = compute_objective(
        cfg,
        jnp.asarray(loc_p),
        jnp.asarray(loc_t),
        jnp.asarray(cls_p),
        jnp.asarray(cls_t),
        cls_targets_remapped=jnp.asarray(cls_r),
        cls_preds_for_neg=jnp.asarray(cls_pn) if use_neg_preds else None,
    )

    np.testing.assert_allclose(
        float(got["loss"]), want["loss"].item(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(got["loc_smoothL1"]), want["loc_smoothL1"].item(), rtol=1e-4, atol=1e-5
    )
    # match the remaining loss components by suffix (the reference embeds the
    # hard-neg ratio in the names, which differs between oracle and port)
    def find(d, suffix):
        keys = [
            k
            for k in d
            if k.startswith("cls_")
            and (k.endswith(suffix) if suffix else ("_pos" not in k and "_neg" not in k))
        ]
        assert len(keys) == 1, (suffix, list(d.keys()))
        return d[keys[0]]

    for suffix in ("", "_pos"):
        np.testing.assert_allclose(
            float(find(got, suffix)), find(want, suffix).item(), rtol=1e-4, atol=1e-5
        )
    # _neg carries the ratio suffix in contrastive mode
    got_neg = [v for k, v in got.items() if "_neg" in k]
    want_neg = [v for k, v in want.items() if "_neg" in k]
    np.testing.assert_allclose(
        float(got_neg[0]), want_neg[0].item(), rtol=1e-4, atol=1e-5
    )


def test_objective_patch_mining_mode():
    rng = np.random.RandomState(77)
    loc_p, loc_t, cls_p, cls_t, cls_r, _ = make_inputs(rng)

    ref = Os2dObjective(
        class_loss="RLL",
        margin=0.5,
        margin_pos=0.6,
        class_loss_neg_weight=1.0,
        remap_classification_targets=True,
        localization_weight=0.2,
        neg_to_pos_ratio=3,
        rll_neg_weight_ratio=0.001,
    )
    want_losses, want_pa = ref(
        torch.as_tensor(loc_p),
        torch.as_tensor(loc_t),
        torch.as_tensor(cls_p),
        torch.as_tensor(cls_t),
        cls_targets_remapped=torch.as_tensor(cls_r),
        patch_mining_mode=True,
    )

    cfg = ObjectiveConfig()
    got_losses, got_pa = compute_objective(
        cfg,
        jnp.asarray(loc_p),
        jnp.asarray(loc_t),
        jnp.asarray(cls_p),
        jnp.asarray(cls_t),
        cls_targets_remapped=jnp.asarray(cls_r),
        patch_mining_mode=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got_pa["pos_mask"]), want_pa["pos_mask"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(got_pa["neg_mask"]), want_pa["neg_mask"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(got_pa["cls_loss"]), want_pa["cls_loss"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_pa["loc_loss"]), want_pa["loc_loss"].numpy(), rtol=1e-4, atol=1e-5
    )


def test_objective_no_positives_is_finite():
    rng = np.random.RandomState(1)
    loc_p, loc_t, cls_p, _, _, _ = make_inputs(rng, b=1, l=2, a=20)
    cls_t = np.zeros((1, 2, 20), np.int64)  # no positives at all
    cfg = ObjectiveConfig()
    got, _ = compute_objective(
        cfg, jnp.asarray(loc_p), jnp.asarray(loc_t), jnp.asarray(cls_p), jnp.asarray(cls_t)
    )
    assert np.isfinite(float(got["loss"]))

"""BN folding (inference): folded params reproduce the unfolded forward.

Folding absorbs every frozen BatchNorm into the preceding conv's weights
(models/resnet.py fold_batchnorm_c4, models/transform_net.py
fold_batchnorm_transform_net, models/os2d.py fold_inference_params) so the
eval path does strictly less work per layer and can stay bf16 end-to-end.
These tests pin the numerical parity of the fold in fp32 and the sanity of
the bf16 folded path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
from os2d_tpu.models.head import build_class_head, head_forward
from os2d_tpu.models.os2d import fold_inference_params
from os2d_tpu.models.resnet import (
    fold_batchnorm_c4,
    init_resnet_c4_params,
    resnet_c4_forward,
)
from os2d_tpu.models.transform_net import (
    fold_batchnorm_transform_net,
    init_transform_net_params,
    transform_net_forward,
)


def _randomize_bn_stats(params, rng):
    """Init gives mean=0/var=1 which would make folding trivially exact in
    places; perturb the stats so the test actually exercises the algebra."""

    def visit(node):
        if isinstance(node, dict):
            if "mean" in node and "var" in node:
                c = node["mean"].shape[0]
                node["mean"] = jnp.asarray(rng.randn(c).astype(np.float32) * 0.5)
                node["var"] = jnp.asarray(
                    0.25 + rng.rand(c).astype(np.float32) * 2.0
                )
                node["scale"] = jnp.asarray(
                    0.5 + rng.rand(c).astype(np.float32)
                )
                node["bias"] = jnp.asarray(rng.randn(c).astype(np.float32) * 0.2)
            else:
                for v in node.values():
                    visit(v)
        elif isinstance(node, list):
            for v in node:
                visit(v)

    visit(params)
    return params


def test_backbone_fold_matches_unfolded():
    rng = np.random.RandomState(0)
    params = _randomize_bn_stats(
        init_resnet_c4_params(jax.random.PRNGKey(0), "resnet50"), rng
    )
    images = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    ref = np.asarray(resnet_c4_forward(params, images))
    folded = fold_batchnorm_c4(params)
    out = np.asarray(resnet_c4_forward(folded, images))
    # randomized BN stats push activations to O(100); fold-order float error
    # is absolute ~1e-3 there, and relu zero-crossings break rtol
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=5e-3)


def test_groupnorm_params_pass_through():
    rng = np.random.RandomState(1)
    params = init_resnet_c4_params(jax.random.PRNGKey(1), "resnet50",
                                   use_group_norm=True)
    images = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    ref = np.asarray(resnet_c4_forward(params, images))
    out = np.asarray(resnet_c4_forward(fold_batchnorm_c4(params), images))
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)  # GN fold is a no-op


def test_transform_net_fold_matches_unfolded():
    rng = np.random.RandomState(2)
    params = _randomize_bn_stats(
        init_transform_net_params(jax.random.PRNGKey(2)), rng
    )
    # zero-init final layer would hide errors in the trunk; randomize it
    params["linear"]["w"] = jnp.asarray(
        rng.randn(5, 5, 64, 6).astype(np.float32) * 0.05
    )
    corr = jnp.asarray(rng.randn(1, 6, 8, 225).astype(np.float32))
    ref = np.asarray(transform_net_forward(params, corr))
    folded = fold_batchnorm_transform_net(params)
    assert "bn0" not in folded and "bn1" not in folded
    out = np.asarray(transform_net_forward(folded, corr))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_full_model_fold_parity_and_bf16():
    rng = np.random.RandomState(3)
    cfg = Os2dConfig()
    params = _randomize_bn_stats(
        init_os2d_params(jax.random.PRNGKey(3), cfg), rng
    )
    params["transform_net"]["linear"]["w"] = jnp.asarray(
        rng.randn(5, 5, 64, 6).astype(np.float32) * 0.05
    )
    folded = fold_inference_params(params)

    images = jnp.asarray(rng.randn(1, 128, 160, 3).astype(np.float32))
    class_images = jnp.asarray(rng.randn(2, 96, 96, 3).astype(np.float32))

    def run(p, dtype):
        fm = resnet_c4_forward(p["backbone"], images, dtype)
        head = build_class_head(resnet_c4_forward(p["backbone"], class_images, dtype))
        return head_forward(
            p["transform_net"], fm.astype(jnp.float32), head, compute_dtype=dtype
        )

    ref = run(params, jnp.float32)
    out = run(folded, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out["cls"]), np.asarray(ref["cls"]), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["loc"]), np.asarray(ref["loc"]), rtol=1e-3, atol=2e-3
    )

    # folded bf16: finite and tracks fp32 within the bf16 budget used in
    # test_bf16.py; top-anchor ordering per class must agree
    out16 = run(folded, jnp.bfloat16)
    cls32 = np.asarray(ref["cls"])
    cls16 = np.asarray(out16["cls"], np.float32)
    assert np.isfinite(cls16).all()
    assert np.abs(cls16 - cls32).max() < 0.05, np.abs(cls16 - cls32).max()
    assert (cls16.argmax(-1) == cls32.argmax(-1)).all()

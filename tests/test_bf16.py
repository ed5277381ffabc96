"""bfloat16 compute path: outputs stay close to fp32 (MXU-precision budget)."""

import numpy as np
import jax
import jax.numpy as jnp

from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
from os2d_tpu.models.head import build_class_head, head_forward
from os2d_tpu.models.resnet import resnet_c4_forward


def test_bf16_head_close_to_fp32():
    rng = np.random.RandomState(0)
    cfg = Os2dConfig()
    params = init_os2d_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.randn(1, 128, 160, 3).astype(np.float32))
    class_images = jnp.asarray(rng.randn(2, 96, 96, 3).astype(np.float32))

    outs = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        fm = resnet_c4_forward(params["backbone"], images, dtype)
        cfm = resnet_c4_forward(params["backbone"], class_images, dtype)
        head = build_class_head(cfm)
        outs[dtype] = head_forward(
            params["transform_net"], fm.astype(jnp.float32), head,
            compute_dtype=dtype,
        )

    cls32 = np.asarray(outs[jnp.float32]["cls"])
    cls16 = np.asarray(outs[jnp.bfloat16]["cls"])
    # recognition scores live in [-1, 1]; bf16 should track within a few 1e-2
    assert np.abs(cls16 - cls32).max() < 0.05, np.abs(cls16 - cls32).max()
    # score ORDERING is what decides detections: top anchor must agree per class
    assert (cls16.argmax(-1) == cls32.argmax(-1)).all()

    loc32 = np.asarray(outs[jnp.float32]["loc"])
    loc16 = np.asarray(outs[jnp.bfloat16]["loc"])
    assert np.abs(loc16 - loc32).max() < 0.25, np.abs(loc16 - loc32).max()


def test_bf16_model_config_plumbs_through():
    cfg = Os2dConfig(compute_dtype="bfloat16")
    model = Os2dModel(cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    fm = model.extract_features(
        params, jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    )
    assert fm.shape == (1, 4, 4, 1024)
    head = model.build_class_head_from_images(
        params, [jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))]
    )
    out = model.apply_head(params, fm, head)
    assert np.isfinite(np.asarray(out["cls"])).all()

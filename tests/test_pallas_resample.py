"""Pallas resample kernel: correctness in interpreter mode (CPU).

On-hardware status (round 1): the axon remote-compile toolchain wedges on
Mosaic's tpu.dynamic_gather (even an 8x128 lane-gather microtest hangs the
compile service), so the kernel is gated behind cfg.tpu.use_pallas_resample
(default False) until the toolchain supports it. Numerics are verified here
against the XLA implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from os2d_tpu.ops.sampling import resample_correlation_map
from os2d_tpu.ops.pallas_resample import resample_correlation_map_pallas


@pytest.mark.parametrize(
    "b,c,h,w", [(1, 2, 8, 16), (2, 3, 6, 7), (1, 1, 15, 15)]
)
def test_pallas_resample_matches_xla(b, c, h, w):
    rng = np.random.RandomState(0)
    th = tw = 15
    t = th * tw
    corr = jnp.asarray(rng.randn(b, c, h, w, t).astype(np.float32))
    grids = jnp.asarray(
        np.clip(rng.uniform(-1.1, 1.1, (b, c, h, w, th, tw, 2)), -1, 1).astype(
            np.float32
        )
    )
    mask = np.zeros((c, th, tw), np.float32)
    mask[:, 2:-2, 2:-2] = 1
    mask = jnp.asarray(mask / mask.reshape(c, -1).sum(1)[:, None, None])

    want = np.asarray(resample_correlation_map(corr, grids, mask))
    got = np.asarray(
        resample_correlation_map_pallas(corr, grids, mask, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("b,c,h,w", [(1, 2, 8, 16), (2, 3, 12, 16)])
def test_pallas_hat_resample_matches_xla(b, c, h, w):
    """Interpret-mode parity of the fused hat-matmul kernel
    (ops/pallas_hat_resample.py; bf16 matmul -> 'default'-tier error)."""
    from os2d_tpu.ops.pallas_hat_resample import (
        hat_resample_correlation_map_pallas as hat_pallas,
    )

    rng = np.random.RandomState(1)
    th = tw = 5
    t = th * tw
    corr = jnp.asarray(np.tanh(rng.randn(b, c, h, w, t)).astype(np.float32))
    grids = jnp.asarray(
        np.clip(rng.uniform(-1, 1, (b, c, h, w, th, tw, 2)), -1, 1).astype(
            np.float32
        )
    )
    mask = rng.rand(c, th, tw).astype(np.float32)
    mask = jnp.asarray(mask / mask.reshape(c, -1).sum(1)[:, None, None])

    want = np.asarray(
        resample_correlation_map(corr, grids, mask, precision="highest")
    )
    got = np.asarray(hat_pallas(corr, grids, mask, a_blk=64, interpret=True))
    assert np.abs(got - want).max() < 5e-3

"""EXPERIMENTAL Pallas TPU kernel — NOT on any production path.

Fused hat-matmul resample + masked pool of the correlation tensor (the
model's hot op; see ops/sampling.py for the XLA formulation that production
uses, and os2d/modeling/head.py:438-520 for the reference op).

The XLA path materializes the per-axis hat-weight tensors
Wy[b,c,t,a,h] / Wx[b,c,t,a,w] in HBM between the two einsums; this kernel
computes them on the fly in VMEM and feeds the MXU directly:

    out[c, a] = sum_t (Wy[t, a, :] @ (mask[c, t] * corr[c, t, :, :]) @ Wx[t, a, :]^T)

The pool-mask weight is pre-multiplied into corr outside the kernel (one
cheap elementwise pass) so the inner loop is a pure matmul + VPU reduce.
Grid: (B*C, A_tiles); the full template axis T and the corr slab [T, H, W]
for one (b, c) live in VMEM per step (5.9 MB at the largest bench level,
fm 96x128, T=121 interior points). A `fori_loop` walks the T template
points (an unrolled Python loop made Mosaic compile times explode); each
point is one [A_BLK, H] x [H, W] matmul in bf16 (the numerics of the XLA
path's precision='default' tier) plus a VPU hat/row-reduce. No gather
anywhere — this sidesteps the toolchain's tpu.dynamic_gather hang
(BENCH_NOTES.md round 1).

STATUS (BENCH_NOTES.md round 2): compiles and matches numerically, but
MEASURED SLOWER than the XLA batched-einsum path on this toolchain (~40 vs
~9 ms device at C=16, fm 96x128): the per-point [A_BLK, H] x [H, W] matmuls
are too small to fill the MXU and the template loop serializes on the
accumulator. Kept as a documented negative result with an interpret-mode
parity test (tests/test_pallas_resample.py); nothing imports it at runtime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat_resample_kernel(corr_ref, py_ref, px_ref, out_ref,
                         *, t: int, h: int, w: int, a_blk: int):
    """One grid step: all T template points for one (b*c, a-tile) pair.

    corr_ref: [1, T, H, W]     mask-scaled correlation slab for this (b, c)
    py_ref:   [1, T, A_BLK]    sample rows (feature-map y coords, pre-clamped)
    px_ref:   [1, T, A_BLK]    sample cols
    out_ref:  [1, 1, 1, A_BLK] pooled scores (fp32)
    """
    # tpu.iota is integer-only; cast to fp32 afterwards
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (a_blk, h), 1).astype(
        jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (a_blk, w), 1).astype(
        jnp.float32)

    def body(tt, acc):
        py_t = py_ref[0, tt, :]  # [A_BLK]
        px_t = px_ref[0, tt, :]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(py_t[:, None] - iota_h))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(px_t[:, None] - iota_w))
        corr_t = corr_ref[0, tt]  # [H, W]
        r = jnp.dot(
            wy.astype(jnp.bfloat16),
            corr_t.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # [A_BLK, W]
        return acc + jnp.sum(r * wx, axis=1)

    acc = jax.lax.fori_loop(0, t, body, jnp.zeros((a_blk,), jnp.float32))
    out_ref[0, 0, 0, :] = acc


@functools.partial(jax.jit, static_argnames=("a_blk", "interpret"))
def hat_resample_correlation_map_pallas(corr, grids_unit, pool_mask,
                                        a_blk: int = 1024,
                                        interpret: bool = False):
    """Same contract as ops.sampling.resample_correlation_map:

    corr:       [B, C, H, W, T] correlation maps, T-channel = tx * th + ty
    grids_unit: [B, C, H, W, th, tw, 2] unit grids, pre-clamped to [-1, 1]
    pool_mask:  [C, th, tw] spatially-normalized pool mask
    returns     [B, C, H, W] pooled recognition scores
    """
    b, c, h, w, t = corr.shape
    th, tw = grids_unit.shape[-3], grids_unit.shape[-2]
    assert th * tw == t, (th, tw, t)
    a = h * w
    bc = b * c

    grids = grids_unit.reshape(b, c, a, th, tw, 2)
    px = (grids[..., 0] + 1.0) * 0.5 * (w - 1)
    py = (grids[..., 1] + 1.0) * 0.5 * (h - 1)
    # [B, C, A, th, tw] -> [BC, T, A] with T-index = tx*th + ty
    px = px.transpose(0, 1, 4, 3, 2).reshape(bc, t, a)
    py = py.transpose(0, 1, 4, 3, 2).reshape(bc, t, a)
    # [BC, T, H, W] slab, pool mask folded in (saves a dynamic-lane scalar
    # read per template point inside the kernel)
    mask_t = pool_mask.transpose(0, 2, 1).reshape(c, t).astype(jnp.float32)
    mask_t = jnp.tile(mask_t, (b, 1))  # [BC, T]
    corr_r = (
        corr.reshape(bc, h, w, t).transpose(0, 3, 1, 2)
        * mask_t[:, :, None, None]
    )

    a_pad = ((a + a_blk - 1) // a_blk) * a_blk
    if a_pad != a:
        pad = ((0, 0), (0, 0), (0, a_pad - a))
        px = jnp.pad(px, pad)
        py = jnp.pad(py, pad)
    n_a = a_pad // a_blk

    kernel = functools.partial(
        _hat_resample_kernel, t=t, h=h, w=w, a_blk=a_blk
    )
    flops = 2 * bc * t * a * h * w  # stage-1 matmuls dominate
    out = pl.pallas_call(
        kernel,
        grid=(bc, n_a),
        in_specs=[
            pl.BlockSpec((1, t, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, a_blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, a_blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, a_blk), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, n_a, 1, a_blk), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=corr_r.size * 4 + px.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(corr_r, py, px)

    return out.reshape(bc, a_pad)[:, :a].reshape(b, c, h, w).astype(corr.dtype)

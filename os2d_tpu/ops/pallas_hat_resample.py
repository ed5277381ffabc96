"""Pallas TPU kernel: fused hat-matmul resample + masked pool of the
correlation tensor (the model's hot op; see ops/sampling.py for the XLA
formulation and os2d/modeling/head.py:438-520 for the reference op).

The XLA path materializes the per-axis hat-weight tensors
Wy[b,c,t,a,h] / Wx[b,c,t,a,w] in HBM between the two einsums; this kernel
computes them on the fly in VMEM and feeds the MXU directly:

    out[c, a] = sum_t mask[c, t] * (Wy[t, a, :] @ corr[c, :, :, t] @ Wx[t, a, :]^T)

Grid: (BC, A_tiles); the full template axis T and the corr slab
[H, W, T] for one (b, c) live in VMEM per step (5.9 MB at the largest bench
level, fm 96x128, T=121 interior points). Inside a step a static Python loop
walks the T template points; each point is one [A_BLK, H] x [H, W] matmul in
bf16 (the numerics of the XLA path's precision='default' tier) plus a VPU
hat/row-reduce. No gather anywhere — this sidesteps the toolchain's
tpu.dynamic_gather hang (BENCH_NOTES.md round 1).

EVAL-ONLY: no custom VJP is defined; head_forward falls back to the XLA
path in train mode (same policy as the 'int8' tier).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat_resample_kernel(corr_ref, py_ref, px_ref, mask_ref, out_ref,
                         *, t: int, h: int, w: int, a_blk: int):
    """One grid step: all T template points for one (b*c, a-tile) pair.

    corr_ref: [1, H, W, T]   correlation slab for this (b, c)
    py_ref:   [1, T, A_BLK]  sample rows (feature-map y coords, pre-clamped)
    px_ref:   [1, T, A_BLK]  sample cols
    mask_ref: [1, T]         spatially-normalized pool mask weights
    out_ref:  [1, A_BLK]     pooled scores (fp32)
    """
    iota_h = jax.lax.broadcasted_iota(jnp.float32, (a_blk, h), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.float32, (a_blk, w), 1)
    acc = jnp.zeros((a_blk,), jnp.float32)
    for tt in range(t):
        py_t = py_ref[0, tt, :]  # [A_BLK]
        px_t = px_ref[0, tt, :]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(py_t[:, None] - iota_h))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(px_t[:, None] - iota_w))
        corr_t = corr_ref[0, :, :, tt]  # [H, W]
        r = jnp.dot(
            wy.astype(jnp.bfloat16),
            corr_t.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # [A_BLK, W]
        acc = acc + mask_ref[0, tt] * jnp.sum(r * wx, axis=1)
    out_ref[0, :] = acc


@functools.partial(jax.jit, static_argnames=("a_blk", "interpret"))
def resample_correlation_map_pallas(corr, grids_unit, pool_mask,
                                    a_blk: int = 1024,
                                    interpret: bool = False):
    """Drop-in for ops.sampling.resample_correlation_map (same contract):

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
    corr_r = corr.reshape(bc, h, w, t)
    mask_t = jnp.tile(
        pool_mask.transpose(0, 2, 1).reshape(c, t).astype(jnp.float32), (b, 1)
    )  # [BC, T]

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
            pl.BlockSpec((1, h, w, t), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, a_blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, a_blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, a_blk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, a_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=corr_r.size * 4 * n_a + px.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(corr_r, py, px, mask_t)

    return out[:, :a].reshape(b, c, h, w).astype(corr.dtype)

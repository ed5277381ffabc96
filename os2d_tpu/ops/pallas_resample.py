"""Pallas TPU kernel for the correlation-map resample — the model's hot op.

The XLA gather path (ops/sampling.resample_correlation_map) dominates eval
time (~98% of the head at bench shapes: 982 ms of a 986 ms head for
B=1, C=16, fm 60x80). This kernel keeps each (b, c) correlation plane
[T, H*W] resident in VMEM and performs the four bilinear-corner gathers with
Mosaic's aligned 2D gather (take_along_axis with indices shaped like the
input — which holds exactly here because the anchor count equals H*W), fusing
floor/clip/weights/mask-pool so only px/py and the output touch HBM.

Numerics are identical to the jnp path (fp32 coordinates and accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resample_kernel(corr_ref, px_ref, py_ref, mask_ref, out_ref, *, w: int,
                     h: int):
    """Blocks: corr [1,1,Tp,A_full], px/py [1,1,Tp,Ab], mask [1,Tp],
    out [1,1,Ab]."""
    corr = corr_ref[0, 0]  # [Tp, A_full]
    px = px_ref[0, 0]      # [Tp, Ab]
    py = py_ref[0, 0]

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    a_full = corr.shape[1]
    ab = px.shape[1]

    def gather(yi, xi):
        idx = yi * w + xi  # [Tp, Ab]
        if ab != a_full:
            # pad indices up to the input width for the aligned 2D gather
            idx = jnp.pad(idx, ((0, 0), (0, a_full - ab)))
        vals = jnp.take_along_axis(corr, idx, axis=1)
        return vals[:, :ab]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    sampled = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )  # [Tp, Ab]
    mask = mask_ref[0]  # [Tp]
    out_ref[0, 0] = jnp.sum(sampled * mask[:, None], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def resample_correlation_map_pallas(corr, grids_unit, pool_mask,
                                    interpret: bool = False):
    """Drop-in replacement for ops.sampling.resample_correlation_map.

    Args:
      corr: [B, C, H, W, T] correlation maps, channel t = tx*th + ty.
      grids_unit: [B, C, H, W, th, tw, 2] in [-1, 1] (pre-clamped).
      pool_mask: [C, th, tw].
    Returns scores [B, C, H, W].
    """
    b, c, h, w, t = corr.shape
    th, tw = grids_unit.shape[-3], grids_unit.shape[-2]
    a = h * w

    # T-major layout (t = tx*th + ty), padded to a multiple of 8 sublanes
    t_pad = ((t + 7) // 8) * 8
    corr_t = corr.reshape(b, c, a, t).transpose(0, 1, 3, 2)  # [B, C, T, A]

    grids = grids_unit.reshape(b, c, a, th, tw, 2)
    px = (grids[..., 0] + 1.0) * 0.5 * (w - 1)
    py = (grids[..., 1] + 1.0) * 0.5 * (h - 1)
    # [B, C, A, th, tw] -> [B, C, T, A]
    px = px.transpose(0, 1, 4, 3, 2).reshape(b, c, t, a)
    py = py.transpose(0, 1, 4, 3, 2).reshape(b, c, t, a)
    mask_t = pool_mask.transpose(0, 2, 1).reshape(c, t)

    if t_pad != t:
        pad = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
        corr_t = jnp.pad(corr_t, pad)
        px = jnp.pad(px, pad)
        py = jnp.pad(py, pad)
        mask_t = jnp.pad(mask_t, ((0, 0), (0, t_pad - t)))

    # anchor tile: whole-row blocks keep the gather aligned; tile to bound VMEM
    a_blk = a if a <= 4096 else _largest_divisor_tile(a, 4096)
    grid = (b, c, a // a_blk)

    kernel = functools.partial(_resample_kernel, w=w, h=h)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, t_pad, a), lambda bi, ci, ai: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, a_blk), lambda bi, ci, ai: (bi, ci, 0, ai),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, a_blk), lambda bi, ci, ai: (bi, ci, 0, ai),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda bi, ci, ai: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, a_blk), lambda bi, ci, ai: (bi, ci, ai),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, a), corr.dtype),
        interpret=interpret,
    )(corr_t, px, py, mask_t)
    return out.reshape(b, c, h, w)


def _largest_divisor_tile(a: int, max_tile: int) -> int:
    for tile in range(min(max_tile, a), 0, -1):
        if a % tile == 0:
            return tile
    return a

"""Bilinear sampling ops: align_corners resize, grid_sample, and the fused
correlation-map resample (the model's hot op).

TPU replacements for F.grid_sample / F.affine_grid use sites in the reference:
  - class feature-map resize to the 15x15 reference size via an identity
    affine grid (os2d/modeling/head.py:240-259) -> here a dense interpolation
    matmul (MXU-friendly), mathematically identical for in-range grids.
  - resample_of_correlation_map_fast (os2d/modeling/head.py:438-520): the
    reference merges (channel, y) into one axis and samples in float64 to
    dodge fp32 coordinate blowup. On TPU we instead gather each template
    point's own channel directly at full fp32 coordinate precision, so no
    float64 and no merged-axis trick is needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def _interp_matrix(out_size: int, in_size: int, dtype=jnp.float32):
    """[out, in] bilinear interpolation matrix with align_corners=True."""
    if in_size == 1:
        return jnp.ones((out_size, 1), dtype=dtype)
    if out_size == 1:
        # align_corners with a single output point samples coordinate -1 -> 0
        m = jnp.zeros((1, in_size), dtype=dtype).at[0, 0].set(1.0)
        return m
    pos = jnp.linspace(0.0, in_size - 1.0, out_size)
    i0 = jnp.clip(jnp.floor(pos), 0, in_size - 1).astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    w1 = pos - i0
    w0 = 1.0 - w1
    rows = jnp.arange(out_size)
    m = jnp.zeros((out_size, in_size), dtype=dtype)
    m = m.at[rows, i0].add(w0.astype(dtype))
    m = m.at[rows, i1].add(w1.astype(dtype))
    return m


def resize_bilinear_align_corners(x, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True on NHWC (or HWC) input.

    Exactly equivalent to F.grid_sample over an identity F.affine_grid
    (both align_corners=True), the way the reference resizes class feature
    maps to 15x15 (os2d/modeling/head.py:240-259) — identity grids never
    leave the input extent so padding mode is irrelevant. Implemented as two
    dense matmuls to run on the MXU.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    m_h = _interp_matrix(out_h, h, x.dtype)
    m_w = _interp_matrix(out_w, w, x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", m_h, x)
    y = jnp.einsum("pw,nowc->nopc", m_w, y)
    if squeeze:
        y = y[0]
    return y


def grid_sample_bilinear(img, grid, padding_mode: str = "border"):
    """F.grid_sample(mode=bilinear, align_corners=True) for NHWC images.

    Args:
      img: [N, H, W, C].
      grid: [N, ..., 2] normalized (x, y) coords in [-1, 1].
      padding_mode: 'border' or 'zeros'.
    Returns:
      [N, ..., C] sampled values.
    """
    n, h, w, c = img.shape
    gshape = grid.shape[1:-1]
    grid = grid.reshape(n, -1, 2)
    px = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    py = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def _gather(yi, xi):
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = yi_c * w + xi_c  # [N, P]
        vals = jnp.take_along_axis(
            img.reshape(n, h * w, c), flat[..., None], axis=1
        )  # [N, P, C]
        if padding_mode == "zeros":
            inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            vals = vals * inside[..., None].astype(vals.dtype)
        return vals

    v00 = _gather(y0, x0)
    v01 = _gather(y0, x0 + 1)
    v10 = _gather(y0 + 1, x0)
    v11 = _gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    return out.reshape((n,) + gshape + (c,))


def resample_correlation_map(corr, grids_unit, pool_mask, precision="default",
                             t_chunk=None):
    """Gather-free resample + masked pool of the correlation tensor (the
    model's hot op) as dense MXU contractions.

    Bilinear sampling is factored through per-axis hat-function weight rows:
    Wy[t,a,h'] = max(0, 1 - |py - h'|) and Wx likewise hold exactly the
    bilinear corner weights in their <=2-wide support, so
    out[t,a] = Wy[t,a,:] @ corr_t @ Wx[t,a,:]^T is the exact border-clamped
    align_corners bilinear sample (coords pre-clamped to [-1,1], as
    os2d/modeling/head.py:384). On TPU this replaces XLA's scalar gather path
    with batched matmuls: 437 ms -> 11.8 ms at bench shapes (fp32-exact with
    precision='highest', 7.9 ms / 3.4e-6 abs with the default 'high',
    4.8 ms / ~7e-4 abs with 'default').
    Template points scan in chunks of t_chunk to bound the weight buffers.
    Gradients w.r.t. the grids are the standard piecewise-linear bilinear
    gradients (hat is piecewise linear).

    Args / returns: see resample_correlation_map_gather (same contract).
    t_chunk: template points per unrolled chunk; None = measured heuristic
    (Os2dConfig.resample_t_chunk overrides).
    """
    b, c, h, w, t = corr.shape
    th, tw = grids_unit.shape[-3], grids_unit.shape[-2]
    assert th * tw == t, (th, tw, t)
    a = h * w

    grids = grids_unit.reshape(b, c, a, th, tw, 2)
    px = (grids[..., 0] + 1.0) * 0.5 * (w - 1)
    py = (grids[..., 1] + 1.0) * 0.5 * (h - 1)
    # [B, C, A, th, tw] -> [B, C, T, A] with T-index = tx*th + ty
    px = px.transpose(0, 1, 4, 3, 2).reshape(b, c, t, a)
    py = py.transpose(0, 1, 4, 3, 2).reshape(b, c, t, a)
    mask_t = pool_mask.transpose(0, 2, 1).reshape(c, t).astype(corr.dtype)
    return resample_correlation_from_pxpy(
        corr, px, py, mask_t, precision=precision, t_chunk=t_chunk)


def resample_correlation_from_pxpy(corr, px, py, mask_t, precision="default",
                                   t_chunk=None):
    """Core of resample_correlation_map for callers that already hold T-MAJOR
    pixel coordinates.

    head_forward computes px/py straight from the per-anchor affine theta
    (an outer product over the template lattice), which emits them directly
    in this [B, C, T, A] layout — skipping the [B, C, H, W, th, tw, 2] grid
    tensors and the whole-tensor [A, th, tw] -> [T, A] relayout transposes
    the grid path pays (r5 profile: the grid reshapes/copies are several
    ms/dispatch at bench shapes).

    Args:
      corr: [B, C, H, W, T] correlation maps (T-channel t = tx*th + ty).
      px, py: [B, C, T, A] pixel-space sample coordinates (already clamped
        to the feature-map extent by the caller's [-1, 1] grid clip).
      mask_t: [C, T] spatially-normalized pool mask in the same t order.
    Returns scores [B, C, H, W] in corr.dtype.
    """
    b, c, h, w, t = corr.shape
    a = h * w
    if t_chunk is None or t_chunk <= 0:
        # MEASURED r3 (BENCH_NOTES): at class chunks > ~32 XLA lowers each
        # chunk's hat einsum pair as one VPU loop fusion (materializing the
        # [B,C,t,A,H] hat operand for real MXU dots OOMs / runs 3x slower),
        # and the fusion runs fastest with the smallest t granularity:
        # C=1024 t_chunk 8 -> 1 is 4.0 -> 3.4 s/image. Small class chunks
        # keep the r2-tuned value.
        t_chunk = 8 if c <= 32 else 1

    # corr stays in its NATURAL [B, C, H, W, T] layout (t already tx*th+ty):
    # chunks slice the contiguous last axis and the first einsum associates
    # (h, w, t) itself — measurably faster than pre-transposing to
    # [B, C, T, H, W] (the transpose was an HBM copy of the whole tensor)
    corr_p = corr
    mask_t = mask_t.astype(corr.dtype)

    n_chunks = (t + t_chunk - 1) // t_chunk
    t_pad = n_chunks * t_chunk
    if t_pad != t:
        pad4 = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
        corr_p = jnp.pad(
            corr_p, ((0, 0), (0, 0), (0, 0), (0, 0), (0, t_pad - t))
        )
        px = jnp.pad(px, pad4)
        py = jnp.pad(py, pad4)
        mask_t = jnp.pad(mask_t, ((0, 0), (0, t_pad - t)))

    iota_h = jnp.arange(h, dtype=px.dtype)
    iota_w = jnp.arange(w, dtype=px.dtype)

    # The "int8" tier runs the big h-contraction on the MXU's int8 path
    # (2x the bf16 rate on v5e): corr is a cosine of two L2-normalized
    # feature vectors, so |corr| <= 1 and fixed-point x127 loses ~0.004 abs —
    # the same error scale as the bf16 mantissa of the 'default' tier.
    # EVAL-ONLY: round() kills the gradient w.r.t. the sampling grids
    # (head_forward falls back to 'default' in train mode).
    int8_tier = precision == "int8"
    out_dtype = corr.dtype
    if int8_tier:
        corr_p = jnp.clip(jnp.round(corr_p * 127.0), -127, 127).astype(jnp.int8)

    # Python-unrolled static chunks (n_chunks is small and static, e.g. 16 for
    # the 121 interior template points): a lax.scan here forced XLA to copy
    # the whole corr tensor into a chunk-leading stacked layout — profiled at
    # >60% of device time as copy-start/copy-done pairs. Static slices fuse
    # into the einsums with no staging copies (tools/profile_fused.py, r2).
    # Rejected reformulations (measured, BENCH_NOTES r3; branches removed r4):
    # W-first einsum order (lane-exact K) 4.00 -> 4.55 s/image at C=1024;
    # bf16-native hat generation 10.39 -> 10.07 img/s; bf16 first-einsum
    # intermediate neutral; forcing MXU dots via optimization_barrier OOMs or
    # runs 3x slower than XLA's VPU loop fusion; lane-padding T 225 -> 256
    # neutral.

    def _hat(p_i, iota):
        return jnp.maximum(0.0, 1.0 - jnp.abs(p_i[..., None] - iota))

    scores = jnp.zeros((b, c, a), jnp.float32)
    for k in range(n_chunks):
        ts = slice(k * t_chunk, (k + 1) * t_chunk)
        px_i = px[:, :, ts]
        py_i = py[:, :, ts]
        corr_i = corr_p[..., ts]
        mask_i = mask_t[:, ts]
        wy = _hat(py_i, iota_h)
        wx = _hat(px_i, iota_w)
        if int8_tier:
            wy_q = jnp.round(wy * 127.0).astype(jnp.int8)
            r = jnp.einsum("bctah,bchwt->bctaw", wy_q, corr_i,
                           preferred_element_type=jnp.int32)
            r = r.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
            out = jnp.einsum("bctaw,bctaw->bcta", r, wx,
                             preferred_element_type=jnp.float32,
                             precision="default")
        else:
            r = jnp.einsum("bctah,bchwt->bctaw", wy, corr_i,
                           preferred_element_type=jnp.float32,
                           precision=precision)
            out = jnp.einsum("bctaw,bctaw->bcta", r, wx,
                             preferred_element_type=jnp.float32,
                             precision=precision)
        scores = scores + jnp.sum(out * mask_i[None, :, :, None], axis=2)
    return scores.reshape(b, c, h, w).astype(out_dtype)


def resample_correlation_map_gather(corr, grids_unit, pool_mask):
    """Gather-based resample + masked pool of the correlation tensor.

    For every anchor (h, w) and template point (ty, tx), bilinearly samples the
    correlation channel belonging to that template point at the transformed
    grid position, multiplies by the (spatially normalized) class pool mask and
    sums over the 15x15 template points. Matches
    resample_of_correlation_map_fast (os2d/modeling/head.py:438-520) with
    bilinear / border-padding / align_corners semantics; grids are expected to
    be pre-clamped to [-1, 1] (as in head.py:384).

    Args:
      corr: [B, C, H, W, T] correlation maps; channel t = tx * th + ty
        (the reference's weakalign-compatible "w-major" channel order,
        os2d/modeling/head.py:342-350).
      grids_unit: [B, C, H, W, th, tw, 2] normalized (x, y) in [-1, 1] w.r.t.
        the (W, H) feature-map extent.
      pool_mask: [C, th, tw] spatially-normalized pooling mask
        (os2d/modeling/head.py:296-302).
    Returns:
      scores [B, C, H, W] (the reference keeps a singleton channel dim).
    """
    b, c, h, w, t = corr.shape
    th, tw = grids_unit.shape[-3], grids_unit.shape[-2]
    assert th * tw == t, (th, tw, t)
    a = h * w

    grids = grids_unit.reshape(b, c, a, th, tw, 2)
    px = (grids[..., 0] + 1.0) * 0.5 * (w - 1)
    py = (grids[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    # rearrange [B, C, A, th, tw] -> [B, C, T, A] with T-index = tx*th + ty
    def _to_t_major(v):
        return v.transpose(0, 1, 4, 3, 2).reshape(b, c, t, a)

    corr_t = corr.reshape(b, c, a, t).transpose(0, 1, 3, 2)  # [B, C, T, A]

    def _gather(yi, xi):
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = _to_t_major(yi_c * w + xi_c)  # [B, C, T, A]
        return jnp.take_along_axis(corr_t, flat, axis=3, mode="promise_in_bounds")

    v00 = _gather(y0, x0)
    v01 = _gather(y0, x0 + 1)
    v10 = _gather(y0 + 1, x0)
    v11 = _gather(y0 + 1, x0 + 1)
    wx_t = _to_t_major(wx)
    wy_t = _to_t_major(wy)
    sampled = (
        v00 * (1 - wx_t) * (1 - wy_t)
        + v01 * wx_t * (1 - wy_t)
        + v10 * (1 - wx_t) * wy_t
        + v11 * wx_t * wy_t
    )  # [B, C, T, A]

    mask_t = pool_mask.transpose(0, 2, 1).reshape(1, c, t, 1).astype(sampled.dtype)
    scores = jnp.sum(sampled * mask_t, axis=2)  # [B, C, A]
    return scores.reshape(b, c, h, w)


def resample_correlation_map_masked(corr, grids_unit, pool_mask,
                                    border: int, precision="high",
                                    t_chunk=None):
    """resample_correlation_map restricted to the pool mask's interior.

    The reference pool mask zeroes a border of width 2 around the 15x15
    template (os2d/modeling/head.py:296-302), so 104 of the 225 template
    points contribute exactly zero — this variant skips their gathers
    (1.86x less gather work, bit-identical result). Only valid when the
    mask is zero on that border (the standard construction).
    """
    th, tw = grids_unit.shape[-3], grids_unit.shape[-2]
    ts = slice(border, th - border)
    corr_sub = corr.reshape(corr.shape[:-1] + (tw, th))[..., ts, ts]
    corr_sub = corr_sub.reshape(corr.shape[:-1] + ((tw - 2 * border) * (th - 2 * border),))
    grids_sub = grids_unit[..., ts, ts, :]
    mask_sub = pool_mask[..., ts, ts]
    return resample_correlation_map(corr_sub, grids_sub, mask_sub,
                                    precision=precision, t_chunk=t_chunk)

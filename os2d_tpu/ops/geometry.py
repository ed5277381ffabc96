"""Grid/transform geometry ops (XLA-native, shape-static).

TPU replacements for F.affine_grid (align_corners=True) and the batched 3x3
torch.inverse used by the reference aligner (os2d/modeling/head.py:111-151,
:184). The closed-form adjugate inverse removes both the LAPACK dependency and
the <=65535-per-call chunking workaround of the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize_channels(x, eps=1e-6, axis=-1):
    """x / (||x||_2 + eps) along `axis`.

    Port of normalize_feature_map_L2 (os2d/modeling/head.py:597-601); note the
    epsilon is added to the norm (not under the sqrt).
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / (norm + eps)


def affine_grid_2d(theta, out_h: int, out_w: int):
    """F.affine_grid(theta, (N, 1, out_h, out_w), align_corners=True).

    Args:
      theta: [..., 2, 3] affine matrices mapping OUTPUT grid coords (x, y in
        [-1, 1]) to input coords.
    Returns:
      grid [..., out_h, out_w, 2] with (x, y) coordinates.
    """
    xs = jnp.linspace(-1.0, 1.0, out_w, dtype=theta.dtype)
    ys = jnp.linspace(-1.0, 1.0, out_h, dtype=theta.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # [h, w]
    # explicit multiply-adds (not einsum) keep this exact fp32 on TPU
    t = theta[..., None, None]  # [..., 2, 3, 1, 1]
    grid_x = t[..., 0, 0, :, :] * gx + t[..., 0, 1, :, :] * gy + t[..., 0, 2, :, :]
    grid_y = t[..., 1, 0, :, :] * gx + t[..., 1, 1, :, :] * gy + t[..., 1, 2, :, :]
    return jnp.stack([grid_x, grid_y], axis=-1)


def affine_grid_envelope(theta):
    """Tight per-axis envelope of the affine_grid_2d(theta, gh, gw) lattice.

    Every lattice point is theta @ [ux, uy, 1] with (ux, uy) in [-1, 1]^2
    (endpoints included), so each output coordinate is extremized at the
    +-1 corners:
        min = t2 - (|t0| + |t1|),   max = t2 + (|t0| + |t1|)
    per row. Replaces materializing the full [..., gh, gw, 2] grid to
    min/max-reduce it (the reference materializes and reduces:
    os2d/modeling/head.py:398-420) with six elementwise ops per anchor —
    equal to the lattice min/max up to fp summation order (<= ~1 ulp), with
    the same sign-based gradient as the reduction's argmin/argmax corner.

    Args: theta [..., 2, 3]. Returns (mins, maxs), each [..., 2] as (x, y).
    """
    ext = jnp.abs(theta[..., 0]) + jnp.abs(theta[..., 1])
    ctr = theta[..., 2]
    return ctr - ext, ctr + ext


def affine_grid_corners(theta):
    """The 4 corner points of the affine_grid_2d(theta, gh, gw) lattice.

    Corner (ux, uy) = (+-1, +-1) evaluates to (t0 * ux + t1 * uy) + t2 —
    the same multiply-add order affine_grid_2d uses, so this is bit-exact
    against selecting grids[..., (0, gh-1), :, :][..., (0, gw-1), :] from
    the materialized grid (os2d/modeling/head.py:421-425). Corner order is
    (uy, ux) in ((-1,-1), (-1,+1), (+1,-1), (+1,+1)), matching that
    y-then-x selection.

    Args: theta [..., 2, 3]. Returns [..., 4, 2] of (x, y) per corner.
    """
    rows = []
    for sy in (-1.0, 1.0):
        for sx in (-1.0, 1.0):
            x = theta[..., 0, 0] * sx + theta[..., 0, 1] * sy + theta[..., 0, 2]
            y = theta[..., 1, 0] * sx + theta[..., 1, 1] * sy + theta[..., 1, 2]
            rows.append(jnp.stack([x, y], axis=-1))
    return jnp.stack(rows, axis=-2)


def invert_affine_2x3(theta, reg: float = 1e-5):
    """Invert [..., 2, 3] affine transforms (appending the implicit [0,0,1] row).

    Closed form via the 2x2 adjugate; matches torch.inverse on the 3x3 with
    the reference's 1e-5 diagonal regularization retry applied only where the
    2x2 block is (near-)singular (os2d/modeling/head.py:125-134).
    Returns [..., 2, 3].
    """
    a = theta[..., 0, 0]
    b = theta[..., 0, 1]
    c = theta[..., 0, 2]
    d = theta[..., 1, 0]
    e = theta[..., 1, 1]
    f = theta[..., 1, 2]

    det = a * e - b * d
    bad = jnp.abs(det) < 1e-12
    # regularized retry: theta_reg = theta + 1e-5 * I (applied to the 3x3, but
    # the [0,0,1+1e-5] bottom row only rescales the inverse translation)
    a_r = jnp.where(bad, a + reg, a)
    e_r = jnp.where(bad, e + reg, e)
    scale_t = jnp.where(bad, 1.0 / (1.0 + reg), 1.0)
    det_r = a_r * e_r - b * d

    inv_det = 1.0 / det_r
    ia = e_r * inv_det
    ib = -b * inv_det
    id_ = -d * inv_det
    ie = a_r * inv_det
    # translation of the inverse: -A^{-1} t, rescaled when the regularized
    # bottom-right entry is 1+reg
    ic = -(ia * c + ib * f) * scale_t
    if_ = -(id_ * c + ie * f) * scale_t

    row0 = jnp.stack([ia, ib, ic], axis=-1)
    row1 = jnp.stack([id_, ie, if_], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def local_to_global_grid(grids_local, boxes_xyxy):
    """Map grids from box-local [-1,1] coords to global coordinates.

    Port of convert_box_coordinates_local_to_global
    (os2d/modeling/head.py:18-40).

    Args:
      grids_local: [..., gh, gw, 2] local (x, y) in [-1, 1].
      boxes_xyxy:  [..., 4] boxes, broadcastable against grids_local's leading
        dims (without the gh, gw, 2 suffix).
    Returns:
      [..., gh, gw, 2] global coordinates.
    """
    x_a = (boxes_xyxy[..., 2] - boxes_xyxy[..., 0]) / 2.0
    x_b = (boxes_xyxy[..., 2] + boxes_xyxy[..., 0]) / 2.0
    y_a = (boxes_xyxy[..., 3] - boxes_xyxy[..., 1]) / 2.0
    y_b = (boxes_xyxy[..., 3] + boxes_xyxy[..., 1]) / 2.0
    gx = grids_local[..., 0] * x_a[..., None, None] + x_b[..., None, None]
    gy = grids_local[..., 1] * y_a[..., None, None] + y_b[..., None, None]
    return jnp.stack([gx, gy], axis=-1)

"""OS2D detection head: dense correlation + affine alignment + resampled pooling.

Functional TPU port of Os2dHead / Os2dAlignment / Os2dHeadCreator
(os2d/modeling/head.py:43-435). Classes are a batched array axis (not Python
closures): class feature maps are precomputed once as [C, 15, 15, F], and
`head_forward` evaluates any (image batch, class batch) pair under jit/vmap,
with C chunked by the caller to bound the correlation tensor.

Anchor geometry: the composed receptive field of backbone (rf 16 / stride 16)
and aligner (rf 15 / stride 1) gives image-level anchors of 240x240 at
stride 16 (os2d/modeling/head.py:222-238).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.geometry import (
    affine_grid_2d,
    affine_grid_corners,
    affine_grid_envelope,
    invert_affine_2x3,
    l2_normalize_channels,
    local_to_global_grid,
)
from ..ops.sampling import (
    resample_correlation_map_masked,
    resize_bilinear_align_corners,
)
from ..structures.boxes import clip_to_min_size, encode_boxes, strided_anchor_grid
from ..structures.feature_map import (
    ALIGNER_GRID_SIZE,
    ALIGNER_RECEPTIVE_FIELD,
    ALIGNER_STRIDE,
    FEATURE_MAP_RECEPTIVE_FIELD,
    FEATURE_MAP_STRIDE,
    compose_receptive_field,
)
from .transform_net import transform_net_forward

TEMPLATE_H = ALIGNER_GRID_SIZE.h
TEMPLATE_W = ALIGNER_GRID_SIZE.w

# image-level anchor box / stride (240x240, stride 16 with default geometry)
ANCHOR_BOX, ANCHOR_STRIDE = compose_receptive_field(
    FEATURE_MAP_RECEPTIVE_FIELD,
    FEATURE_MAP_STRIDE,
    ALIGNER_RECEPTIVE_FIELD,
    ALIGNER_STRIDE,
)

POOL_BORDER_WIDTH = 2


def _interior_permutation(border: int = POOL_BORDER_WIDTH):
    """Permutation of the t = tx*th + ty template axis that places the
    (15-2*border)^2 INTERIOR points first (in the compacted order the
    resample consumes) and the border points last.

    The pool mask zeroes the border, so the resample only reads the interior
    — but compacting it from the natural channel order is a strided slice of
    the minor dim, which XLA materializes as a slow whole-tensor relayout
    (~21 ms/dispatch in the r2 profile). Emitting the correlation tensor
    with this permutation makes the interior a contiguous prefix slice; the
    TransformationNet conv is channel-permutation-invariant once its kernel
    rows are permuted to match."""
    interior = [tx * TEMPLATE_H + ty
                for tx in range(border, TEMPLATE_W - border)
                for ty in range(border, TEMPLATE_H - border)]
    inside = set(interior)
    border_idx = [t for t in range(TEMPLATE_W * TEMPLATE_H)
                  if t not in inside]
    return interior + border_idx


def make_class_pool_mask(num_classes: int, dtype=jnp.float32):
    """[C, 15, 15] pooling mask: border of width 2 zeroed, spatially normalized
    (os2d/modeling/head.py:296-302)."""
    m = jnp.zeros((TEMPLATE_H, TEMPLATE_W), dtype)
    m = m.at[
        POOL_BORDER_WIDTH : TEMPLATE_H - POOL_BORDER_WIDTH,
        POOL_BORDER_WIDTH : TEMPLATE_W - POOL_BORDER_WIDTH,
    ].set(1.0)
    m = m / jnp.sum(m)
    return jnp.broadcast_to(m[None], (num_classes, TEMPLATE_H, TEMPLATE_W))


class ClassHead(NamedTuple):
    """Precomputed per-class state (the reference's Os2dHead closure contents)."""

    class_feats: jnp.ndarray  # [C, 15, 15, F], L2-normalized over F
    pool_mask: jnp.ndarray  # [C, 15, 15]


def build_class_head(class_feature_maps) -> ClassHead:
    """Resize per-class feature maps to the 15x15 reference size and normalize.

    Args:
      class_feature_maps: list of [h_i, w_i, F] arrays (or [1, h_i, w_i, F]),
        or a single stacked [C, h, w, F] array.
    """
    if isinstance(class_feature_maps, (list, tuple)):
        resized = []
        for fm in class_feature_maps:
            if fm.ndim == 4:
                fm = fm[0]
            resized.append(resize_bilinear_align_corners(fm, TEMPLATE_H, TEMPLATE_W))
        feats = jnp.stack(resized, axis=0)
    else:
        feats = resize_bilinear_align_corners(class_feature_maps, TEMPLATE_H, TEMPLATE_W)
    feats = l2_normalize_channels(feats, eps=1e-5, axis=-1)
    return ClassHead(class_feats=feats, pool_mask=make_class_pool_mask(feats.shape[0], feats.dtype))


class QuantizedClassHead(NamedTuple):
    """int8-quantized class-feature bank.

    4x smaller HBM footprint than the fp32 bank — at grozi scale (C~1000,
    [C, 15, 15, 1024] fp32 = ~0.9 GB) that headroom matters. Features are
    L2-normalized over F (build_class_head), so per-class absmax scaling
    keeps the quantization step ~absmax/127 and correlation-score error in
    the 1e-3 range. Dequantize per chunk on device (dequantize_class_head)
    inside the jitted program; the bank itself stays int8 in HBM.
    """

    class_feats_q: jnp.ndarray  # [C, 15, 15, F] int8
    scales: jnp.ndarray  # [C] fp32: absmax / 127
    pool_mask: jnp.ndarray  # [C, 15, 15]


def quantize_class_head(head: ClassHead) -> QuantizedClassHead:
    absmax = jnp.max(jnp.abs(head.class_feats), axis=(1, 2, 3))
    scales = (jnp.maximum(absmax, 1e-12) / 127.0).astype(jnp.float32)
    q = jnp.clip(
        jnp.round(head.class_feats / scales[:, None, None, None]), -127, 127
    ).astype(jnp.int8)
    return QuantizedClassHead(q, scales, head.pool_mask)


def dequantize_class_head(qhead: QuantizedClassHead) -> ClassHead:
    feats = qhead.class_feats_q.astype(jnp.float32) * qhead.scales[
        :, None, None, None
    ]
    return ClassHead(class_feats=feats, pool_mask=qhead.pool_mask)


def _prepare_theta(tparams, simple_affine: bool):
    """[N, p] regressor outputs -> [N, 2, 3] affine matrices
    (os2d/modeling/head.py:81-107)."""
    if simple_affine:
        z = jnp.zeros_like(tparams[:, 0])
        theta = jnp.stack(
            [tparams[:, 0], z, tparams[:, 1], z, tparams[:, 2], tparams[:, 3]], axis=1
        )
    else:
        theta = tparams
    return theta.reshape(-1, 2, 3)


def head_forward(
    transform_net_params,
    image_feature_maps,
    class_head: ClassHead,
    *,
    simple_affine: bool = False,
    use_inverse_geom_model: bool = True,
    train_mode: bool = False,
    compute_dtype=jnp.float32,
    resample_precision: str = "default",
    corr_interior_first: bool = True,
    resample_t_chunk: int = 0,
):
    """Score every (image, class, anchor) triple.

    Args:
      image_feature_maps: [B, H, W, F] backbone features (not yet normalized).
      class_head: precomputed ClassHead with [C, 15, 15, F] normalized feats.

    Returns dict with:
      loc:           [B, C, 4, A]  SSD-encoded localization w.r.t. 240/16 anchors
      cls:           [B, C, A]     recognition scores in [-1, 1]
      cls_detached:  [B, C, A]     same, transform detached (== cls at eval)
      corners:       [B, C, 8, A]  transformed box corners (detached, for viz)
      fm_size:       (H, W)
    with A = H * W, anchor a = h * W + w.
    """
    b, h, w, f = image_feature_maps.shape
    c = class_head.class_feats.shape[0]
    a = h * w

    fm = l2_normalize_channels(image_feature_maps, eps=1e-5, axis=-1)

    # dense correlation; corr channel t = w_c * 15 + h_c (weakalign order,
    # os2d/modeling/head.py:342-350). The template axis is pre-flattened on
    # the (tiny) class side so ONE dot_general emits corr directly in its
    # consumed [B, C, H, W, T] layout — the 6-D bchwxy intermediate forced a
    # whole-tensor relayout copy before the TransformationNet conv
    # (profiled ~21 ms/dispatch, tools/profile_fused.py r2)
    feats_t = class_head.class_feats.transpose(0, 2, 1, 3).reshape(
        c, TEMPLATE_W * TEMPLATE_H, f
    )
    t_dim = TEMPLATE_W * TEMPLATE_H

    # interior-first template channel order (default, Os2dConfig
    # .corr_interior_first): the resample then reads a contiguous
    # [..., :121] prefix instead of a strided interior compaction of the
    # minor dim (a slow whole-tensor relayout, ~21 ms/dispatch at C=16 r2,
    # ~200 ms/dispatch at C=1024 r3 profiles); the TN conv kernel rows
    # permute to match, so the computation is exactly the reference's up to
    # channel summation order (mAP-gated: dmAP +0.0000,
    # tools/map_sensitivity.py r3)
    perm = None
    if corr_interior_first:
        perm = _interior_permutation()
        feats_t = feats_t[:, jnp.asarray(perm), :]
    corr = jnp.einsum(
        "bhwf,ctf->bchwt",
        fm.astype(compute_dtype),
        feats_t.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )

    # regress transformation parameters per (image, class, anchor)
    tn_in = corr.reshape(b * c, h, w, t_dim)
    if perm is not None:
        # permute conv0's input-channel rows to match the corr channel order
        tn_params = dict(transform_net_params)
        c0 = tn_params["conv0"]
        tn_params["conv0"] = {
            "w": c0["w"][:, :, jnp.asarray(perm), :], "b": c0["b"]
        }
    else:
        tn_params = transform_net_params
    tparams = transform_net_forward(tn_params, tn_in, compute_dtype)
    theta = _prepare_theta(tparams.reshape(-1, tparams.shape[-1]), simple_affine)
    if use_inverse_geom_model:
        theta = invert_affine_2x3(theta)

    # (1) recognition: grids w.r.t. feature-map-level anchors (box 15, stride 1)
    boxes_fm = strided_anchor_grid(
        w, h, float(ALIGNER_RECEPTIVE_FIELD.w), float(ALIGNER_RECEPTIVE_FIELD.h),
        float(ALIGNER_STRIDE.w), float(ALIGNER_STRIDE.h),
    ).reshape(1, 1, h, w, 4)

    # the "int8" resample tier has no gradient w.r.t. the sampling grids
    # (fixed-point round); training falls back to 'default'
    if train_mode and resample_precision == "int8":
        resample_precision = "default"

    # the pool mask zeroes the 2-wide template border, so the resample skips
    # those points entirely (bit-identical, 1.86x less gather work)
    if perm is not None:
        # interior-first channel order: the interior is a contiguous prefix.
        # Sample coordinates are computed straight from theta as an outer
        # product over the interior lattice, directly in the resample's
        # t-major [B, C, T, A] layout — same scalar expression per point as
        # affine_grid_2d -> local_to_global_grid -> normalize -> clip ->
        # unnormalize (bit-exact), but never materializing the
        # [B, C, H, W, th, tw, 2] grid tensors or their [A, th, tw] ->
        # [T, A] relayout transposes (r5 profile: several ms/dispatch).
        from ..ops.sampling import resample_correlation_from_pxpy

        bw = POOL_BORDER_WIDTH
        ts = slice(bw, TEMPLATE_H - bw)
        n_int = (TEMPLATE_H - 2 * bw) * (TEMPLATE_W - 2 * bw)
        corr_int = corr[..., :n_int]
        mask_t = class_head.pool_mask[..., ts, ts].transpose(0, 2, 1).reshape(
            c, n_int)

        th6 = theta.reshape(b, c, 1, a, 2, 3)
        dt = theta.dtype
        xs_int = jnp.linspace(-1.0, 1.0, TEMPLATE_W, dtype=dt)[ts]
        ys_int = jnp.linspace(-1.0, 1.0, TEMPLATE_H, dtype=dt)[ts]
        # t = tx * th_int + ty (the _interior_permutation / weakalign order)
        ux = jnp.repeat(xs_int, TEMPLATE_H - 2 * bw)[None, None, :, None]
        uy = jnp.tile(ys_int, TEMPLATE_W - 2 * bw)[None, None, :, None]
        lx = th6[..., 0, 0] * ux + th6[..., 0, 1] * uy + th6[..., 0, 2]
        ly = th6[..., 1, 0] * ux + th6[..., 1, 1] * uy + th6[..., 1, 2]
        fb = boxes_fm.reshape(1, 1, 1, a, 4)
        fx_a = (fb[..., 2] - fb[..., 0]) / 2.0
        fx_b = (fb[..., 2] + fb[..., 0]) / 2.0
        fy_a = (fb[..., 3] - fb[..., 1]) / 2.0
        fy_b = (fb[..., 3] + fb[..., 1]) / 2.0
        gx = (lx * fx_a + fx_b) / (w - 1) * 2.0 - 1.0
        gy = (ly * fy_a + fy_b) / (h - 1) * 2.0 - 1.0
        gx = jnp.clip(gx, -1.0, 1.0)
        gy = jnp.clip(gy, -1.0, 1.0)
        px = (gx + 1.0) * 0.5 * (w - 1)
        py = (gy + 1.0) * 0.5 * (h - 1)

        def _resample(px_, py_):
            return resample_correlation_from_pxpy(
                corr_int, px_, py_, mask_t,
                precision=resample_precision, t_chunk=resample_t_chunk)

        cls = _resample(px, py)
        if train_mode:
            cls_detached = _resample(jax.lax.stop_gradient(px),
                                     jax.lax.stop_gradient(py))
        else:
            cls_detached = cls
    else:
        grids_local = affine_grid_2d(theta, TEMPLATE_H, TEMPLATE_W)
        grids_local = grids_local.reshape(b, c, h, w, TEMPLATE_H, TEMPLATE_W, 2)
        grids_fm = local_to_global_grid(grids_local, boxes_fm)
        gx = grids_fm[..., 0] / (w - 1) * 2.0 - 1.0
        gy = grids_fm[..., 1] / (h - 1) * 2.0 - 1.0
        grids_unit = jnp.clip(jnp.stack([gx, gy], axis=-1), -1.0, 1.0)

        def _resample(g):
            return resample_correlation_map_masked(
                corr, g, class_head.pool_mask, POOL_BORDER_WIDTH,
                precision=resample_precision, t_chunk=resample_t_chunk,
            )

        cls = _resample(grids_unit)
        if train_mode:
            cls_detached = _resample(jax.lax.stop_gradient(grids_unit))
        else:
            cls_detached = cls

    # (2) localization: envelope + corners in closed form from theta w.r.t.
    # image-level anchors (box 240, stride 16). The affine lattice's extremes
    # sit at its +-1 corners, so the reference's materialize-then-min/max
    # over all gh*gw grid points (os2d/modeling/head.py:398-425; ~1.2 GB of
    # grid tensors per dispatch at bench shapes) reduces to a handful of
    # elementwise ops per anchor (ops/geometry.py:affine_grid_envelope).
    boxes_img = strided_anchor_grid(
        w, h, float(ANCHOR_BOX.w), float(ANCHOR_BOX.h),
        float(ANCHOR_STRIDE.w), float(ANCHOR_STRIDE.h),
    ).reshape(1, 1, h, w, 4)
    th4 = theta.reshape(b, c, h, w, 2, 3)
    ix_a = (boxes_img[..., 2] - boxes_img[..., 0]) / 2.0  # [1, 1, h, w]
    ix_b = (boxes_img[..., 2] + boxes_img[..., 0]) / 2.0
    iy_a = (boxes_img[..., 3] - boxes_img[..., 1]) / 2.0
    iy_b = (boxes_img[..., 3] + boxes_img[..., 1]) / 2.0

    lmin, lmax = affine_grid_envelope(th4)  # [b, c, h, w, 2] each
    class_boxes = jnp.stack(
        [
            lmin[..., 0] * ix_a + ix_b,
            lmin[..., 1] * iy_a + iy_b,
            lmax[..., 0] * ix_a + ix_b,
            lmax[..., 1] * iy_a + iy_b,
        ],
        axis=-1,
    )  # [B, C, H, W, 4]
    class_boxes = clip_to_min_size(class_boxes, 1.0)
    default_boxes = clip_to_min_size(boxes_img, 1.0)
    loc = encode_boxes(class_boxes, default_boxes)  # [B, C, H, W, 4]

    # corners of the transformed grids, detached (os2d/modeling/head.py:421-425)
    cl = affine_grid_corners(th4)  # [b, c, h, w, 4, 2]
    corners = jax.lax.stop_gradient(
        jnp.stack(
            [cl[..., 0] * ix_a[..., None] + ix_b[..., None],
             cl[..., 1] * iy_a[..., None] + iy_b[..., None]],
            axis=-1,
        )
    ).reshape(b, c, h, w, 8)

    return {
        "loc": loc.transpose(0, 1, 4, 2, 3).reshape(b, c, 4, a),
        "cls": cls.reshape(b, c, a),
        "cls_detached": cls_detached.reshape(b, c, a),
        "corners": corners.transpose(0, 1, 4, 2, 3).reshape(b, c, 8, a),
        "fm_size": (h, w),
    }

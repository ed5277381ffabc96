"""Golden tests of the sampling/geometry ops against torch core oracles."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from os2d_tpu.ops import (
    affine_grid_2d,
    invert_affine_2x3,
    l2_normalize_channels,
    local_to_global_grid,
    resize_bilinear_align_corners,
    grid_sample_bilinear,
    resample_correlation_map,
)

RNG = np.random.RandomState(42)


def test_affine_grid_matches_torch():
    theta = RNG.randn(6, 2, 3).astype(np.float32)
    want = F.affine_grid(
        torch.as_tensor(theta), torch.Size((6, 1, 15, 15)), align_corners=True
    ).numpy()
    got = np.asarray(affine_grid_2d(jnp.asarray(theta), 15, 15))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_affine_grid_rectangular():
    theta = RNG.randn(2, 2, 3).astype(np.float32)
    want = F.affine_grid(
        torch.as_tensor(theta), torch.Size((2, 1, 7, 11)), align_corners=True
    ).numpy()
    got = np.asarray(affine_grid_2d(jnp.asarray(theta), 7, 11))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_invert_affine_matches_torch_inverse():
    theta = RNG.randn(128, 2, 3).astype(np.float32)
    # keep well-conditioned: push determinants away from zero like the
    # identity-biased regressor output does
    theta[:, 0, 0] += 2.0
    theta[:, 1, 1] += 2.0
    full = torch.cat(
        [
            torch.as_tensor(theta),
            torch.tensor([0.0, 0.0, 1.0]).view(1, 1, 3).expand(128, 1, 3),
        ],
        dim=1,
    )
    want = torch.inverse(full)[:, :2, :].numpy()
    got = np.asarray(invert_affine_2x3(jnp.asarray(theta)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_l2_normalize_matches_reference():
    x = RNG.randn(2, 5, 7, 16).astype(np.float32)
    t = torch.as_tensor(x).permute(0, 3, 1, 2)  # NCHW
    want = (t / (t.norm(dim=1, keepdim=True) + 1e-5)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(l2_normalize_channels(jnp.asarray(x), eps=1e-5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resize_bilinear_matches_grid_sample_identity():
    # the reference's class-feature resize: identity affine_grid + grid_sample
    x = RNG.randn(3, 9, 13, 8).astype(np.float32)
    t = torch.as_tensor(x).permute(0, 3, 1, 2)
    identity = torch.tensor([[1.0, 0, 0], [0, 1.0, 0]]).unsqueeze(0).expand(3, 2, 3)
    grid = F.affine_grid(identity, torch.Size((3, 8, 15, 15)), align_corners=True)
    want = (
        F.grid_sample(t, grid, mode="bilinear", padding_mode="zeros", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 15, 15))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_upsample():
    x = RNG.randn(1, 4, 4, 2).astype(np.float32)
    t = torch.as_tensor(x).permute(0, 3, 1, 2)
    want = (
        F.interpolate(t, size=(15, 15), mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 15, 15))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_border_matches_torch():
    img = RNG.randn(2, 10, 14, 3).astype(np.float32)
    grid = RNG.uniform(-1.3, 1.3, (2, 6, 5, 2)).astype(np.float32)
    t = torch.as_tensor(img).permute(0, 3, 1, 2)
    want = (
        F.grid_sample(
            t,
            torch.as_tensor(grid),
            mode="bilinear",
            padding_mode="border",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid), "border"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_zeros_matches_torch():
    img = RNG.randn(1, 8, 8, 4).astype(np.float32)
    grid = RNG.uniform(-1.5, 1.5, (1, 20, 2)).astype(np.float32).reshape(1, 4, 5, 2)
    t = torch.as_tensor(img).permute(0, 3, 1, 2)
    want = (
        F.grid_sample(
            t,
            torch.as_tensor(grid),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid), "zeros"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _reference_resample_simple(corr, grids, pool_mask):
    """Literal torch port of resample_of_correlation_map_simple
    (os2d/modeling/head.py:522-594) as the oracle."""
    b, c, t, h, w = corr.shape
    th, tw = grids.shape[4], grids.shape[5]
    corr_v = corr.reshape(b * c, t, h, w)
    grids_v = grids.reshape(b * c, h, w, th, tw, 2)
    matches = []
    for tx in range(tw):
        for ty in range(th):
            ch = tx * th + ty
            channel = corr_v[:, ch : ch + 1]
            pts = grids_v[:, :, :, ty, tx, :]
            m = F.grid_sample(
                channel, pts, mode="bilinear", padding_mode="border", align_corners=True
            )
            matches.append(m)
    matches = torch.stack(matches, -1).reshape(b, c, h, w, th * tw)
    mask = pool_mask.reshape(1, c, 1, 1, th * tw)
    return (matches * mask).sum(-1)


def test_resample_correlation_map_matches_reference():
    b, c, h, w, th, tw = 2, 3, 6, 7, 5, 5
    t = th * tw
    corr = RNG.randn(b, c, t, h, w).astype(np.float32)
    grids = np.clip(RNG.uniform(-1.2, 1.2, (b, c, h, w, th, tw, 2)), -1, 1).astype(
        np.float32
    )
    # the real pool mask (border zeroed + spatial norm) is transpose-symmetric;
    # the reference's 'simple' oracle indexes the mask transposed relative to
    # its 'fast' version (os2d/modeling/head.py:515 vs :589), so only symmetric
    # masks are well-defined — as in the reference model itself.
    mask = np.zeros((c, th, tw), np.float32)
    mask[:, 1 : th - 1, 1 : tw - 1] = 1.0
    mask = mask / mask.reshape(c, -1).sum(1)[:, None, None]

    want = _reference_resample_simple(
        torch.as_tensor(corr), torch.as_tensor(grids), torch.as_tensor(mask)
    ).numpy()

    # my layout: corr [B, C, H, W, T]
    corr_nhwc = np.transpose(corr, (0, 1, 3, 4, 2))
    got = np.asarray(
        resample_correlation_map(
            jnp.asarray(corr_nhwc), jnp.asarray(grids), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resample_int8_tier_close_to_exact():
    """The eval-only 'int8' precision tier (fixed-point x127 on cosine-valued
    correlations) must stay within its designed ~1e-3 error envelope."""
    b, c, h, w, th, tw = 1, 2, 6, 7, 5, 5
    t = th * tw
    corr = np.tanh(RNG.randn(b, c, h, w, t)).astype(np.float32)  # in [-1, 1]
    grids = np.clip(RNG.uniform(-1, 1, (b, c, h, w, th, tw, 2)), -1, 1).astype(
        np.float32
    )
    mask = np.full((c, th, tw), 1.0 / t, np.float32)
    exact = np.asarray(resample_correlation_map(
        jnp.asarray(corr), jnp.asarray(grids), jnp.asarray(mask),
        precision="highest",
    ))
    q = np.asarray(resample_correlation_map(
        jnp.asarray(corr), jnp.asarray(grids), jnp.asarray(mask),
        precision="int8",
    ))
    assert np.abs(q - exact).max() < 3e-3, np.abs(q - exact).max()


def test_local_to_global_grid():
    grids = RNG.uniform(-1, 1, (2, 4, 3, 5, 5, 2)).astype(np.float32)
    boxes = np.array([10.0, 20.0, 40.0, 100.0], np.float32)
    got = np.asarray(
        local_to_global_grid(jnp.asarray(grids), jnp.asarray(boxes))
    )
    want_x = grids[..., 0] * 15.0 + 25.0
    want_y = grids[..., 1] * 40.0 + 60.0
    np.testing.assert_allclose(got[..., 0], want_x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[..., 1], want_y, rtol=1e-5, atol=1e-5)

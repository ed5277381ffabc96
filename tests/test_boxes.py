"""Unit tests for the pure-jnp box geometry vs torch/numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from os2d_tpu.structures import boxes as B
from os2d_tpu.structures.feature_map import (
    FeatureMapSize,
    exact_resize_area,
    feature_map_size_for_image,
)
from os2d_tpu.ops.nms import nms_keep_mask, nms_topk

RNG = np.random.RandomState(0)


def random_boxes(n, size=100.0, rng=RNG):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def torch_box_iou(a, b):
    # literal port of torchvision.ops.box_iou
    a, b = torch.as_tensor(a), torch.as_tensor(b)
    area1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.max(a[:, None, :2], b[:, :2])
    rb = torch.min(a[:, None, 2:], b[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, :, 0] * wh[:, :, 1]
    return inter / (area1[:, None] + area2 - inter)


def test_box_iou_matches_torchvision_formula():
    a = random_boxes(23)
    b = random_boxes(17)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    want = torch_box_iou(a, b).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_encode_decode_roundtrip():
    anchors = random_boxes(64)
    gt = random_boxes(64)
    codes = B.encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
    rec = B.decode_boxes(codes, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-3)


def test_encode_matches_torchvision_formula():
    anchors = random_boxes(32)
    gt = random_boxes(32)

    # literal port of torchvision encode_boxes
    pa = torch.as_tensor(anchors)
    pg = torch.as_tensor(gt)
    wx, wy, ww, wh = 10.0, 10.0, 5.0, 5.0
    ex_w = pa[:, 2] - pa[:, 0]
    ex_h = pa[:, 3] - pa[:, 1]
    ex_cx = pa[:, 0] + 0.5 * ex_w
    ex_cy = pa[:, 1] + 0.5 * ex_h
    gt_w = pg[:, 2] - pg[:, 0]
    gt_h = pg[:, 3] - pg[:, 1]
    gt_cx = pg[:, 0] + 0.5 * gt_w
    gt_cy = pg[:, 1] + 0.5 * gt_h
    want = torch.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * torch.log(gt_w / ex_w),
            wh * torch.log(gt_h / ex_h),
        ],
        dim=1,
    ).numpy()
    got = np.asarray(B.encode_boxes(jnp.asarray(gt), jnp.asarray(anchors)))
    # fp32 log differs slightly between XLA and torch
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_decode_applies_xform_clip():
    anchors = np.array([[0.0, 0.0, 10.0, 10.0]], np.float32)
    codes = np.array([[0.0, 0.0, 100.0, 100.0]], np.float32)  # dw/ww = 20 >> clip
    out = np.asarray(B.decode_boxes(jnp.asarray(codes), jnp.asarray(anchors)))
    w = out[0, 2] - out[0, 0]
    assert np.isfinite(w)
    np.testing.assert_allclose(w, 10.0 * 1000.0 / 16, rtol=1e-4)


def test_matcher_thresholds_and_difficult():
    # anchors: a0 high IoU with gt0, a1 mid IoU, a2 low IoU, a3 high with difficult gt1
    anchors = np.array(
        [
            [0, 0, 10, 10],
            [6, 0, 16, 10],
            [40, 40, 50, 50],
            [100, 100, 110, 110],
        ],
        np.float32,
    )
    gts = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32)
    ious = B.box_iou(jnp.asarray(gts), jnp.asarray(anchors))
    idx, max_iou = B.match_anchors(
        ious,
        gt_valid=jnp.asarray([True, True]),
        gt_difficult=jnp.asarray([False, True]),
        high_threshold=0.5,
        low_threshold=0.1,
    )
    idx = np.asarray(idx)
    assert idx[0] == 0  # IoU 1.0 -> positive match to gt0
    assert idx[1] == -2  # IoU ~0.25 -> between thresholds -> ignore
    assert idx[2] == -1  # IoU 0 -> negative
    assert idx[3] == -2  # matched to difficult gt -> ignore
    # cls target mapping of the reference: 1 + clip(index, -2, 0)
    cls = 1 + np.clip(idx, -2, 0)
    np.testing.assert_array_equal(cls, [1, -1, 0, -1])


def test_matcher_ignores_padded_gt():
    anchors = np.array([[0, 0, 10, 10]], np.float32)
    gts = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    ious = B.box_iou(jnp.asarray(gts), jnp.asarray(anchors))
    idx, _ = B.match_anchors(
        ious,
        gt_valid=jnp.asarray([False, True]),
        gt_difficult=jnp.asarray([False, False]),
        high_threshold=0.5,
        low_threshold=0.1,
    )
    assert int(idx[0]) == 1  # must match the valid row, not the padded one


def test_clip_to_min_size():
    boxes = np.array([[5, 5, 5.2, 20], [0, 0, 10, 0.5]], np.float32)
    out = np.asarray(B.clip_to_min_size(jnp.asarray(boxes), 1.0))
    np.testing.assert_allclose(out[0], [5, 5, 6, 20])
    np.testing.assert_allclose(out[1], [0, 0, 10, 1])


def greedy_nms_reference(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        iou = torch_box_iou(boxes[i : i + 1], boxes).numpy()[0]
        suppressed |= iou > thr
        suppressed[i] = True  # kept, but cannot be revisited
    return np.array(keep)


@pytest.mark.parametrize("n", [1, 7, 100, 333])
def test_nms_matches_greedy(n):
    rng = np.random.RandomState(n)
    boxes = random_boxes(n, rng=rng)
    scores = rng.uniform(-1, 1, n).astype(np.float32)
    want_keep = greedy_nms_reference(boxes, scores, 0.3)
    got_mask = np.asarray(
        nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.3)
    )
    got_keep = np.nonzero(got_mask)[0]
    np.testing.assert_array_equal(np.sort(got_keep), np.sort(want_keep))


@pytest.mark.parametrize("n", [100, 3000])
def test_nms_blocked_matches_dense(n):
    """The tiled (memory-bounded) fixpoint must equal the dense relation and
    the host greedy reference — it replaces the [K, K] suppress matrix that
    OOMed at exact-parity full scale (K = 39580 anchors)."""
    rng = np.random.RandomState(n + 1)
    boxes = random_boxes(n, rng=rng)
    scores = rng.uniform(-1, 1, n).astype(np.float32)
    valid = rng.rand(n) > 0.1
    dense = np.asarray(nms_keep_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.3))
    blocked = np.asarray(nms_keep_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.3,
        dense_limit=64, block=96))
    np.testing.assert_array_equal(blocked, dense)
    want = greedy_nms_reference(boxes[valid], scores[valid], 0.3)
    got = np.nonzero(blocked[valid])[0]
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_nms_topk_sorted_and_padded():
    boxes = np.array(
        [[0, 0, 10, 10], [100, 100, 110, 110], [1, 1, 11, 11]], np.float32
    )
    scores = np.array([0.5, 0.9, 0.7], np.float32)
    tb, ts, tv, _ = nms_topk(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(3, bool), 0.3, top_k=4
    )
    ts = np.asarray(ts)
    tv = np.asarray(tv)
    assert tv.tolist() == [True, True, False, False]  # box0 suppressed by box2
    np.testing.assert_allclose(ts[:2], [0.9, 0.7])
    assert np.isneginf(ts[2:]).all()


def test_feature_map_size_arithmetic():
    # golden sizes from the reference dummy-forward probe
    assert feature_map_size_for_image(FeatureMapSize(w=1280, h=1280)) == FeatureMapSize(
        w=80, h=80
    )
    assert feature_map_size_for_image(FeatureMapSize(w=400, h=600)) == FeatureMapSize(
        w=25, h=38
    )
    assert feature_map_size_for_image(FeatureMapSize(w=240, h=240)) == FeatureMapSize(
        w=15, h=15
    )


def test_exact_resize_area_matches_reference_util():
    # port parity with get_image_size_after_resize_preserving_aspect_ratio
    import math

    for (h, w, t) in [(3264, 2448, 1280), (100, 350, 240), (7, 3, 240)]:
        r = float(h) / w
        want_w = int(t / math.sqrt(r))
        want_h = int(t * math.sqrt(r))
        got = exact_resize_area(w=w, h=h, target_area_side=t)
        assert got.w == max(want_w, 1) and got.h == max(want_h, 1)


def test_strided_anchor_grid():
    g = np.asarray(B.strided_anchor_grid(3, 2, 240.0, 240.0, 16.0, 16.0))
    assert g.shape == (6, 4)
    # first anchor centered at (8, 8)
    np.testing.assert_allclose(g[0], [8 - 120, 8 - 120, 8 + 120, 8 + 120])
    # row-major: anchor 1 is x-shifted
    np.testing.assert_allclose(g[1, 0] - g[0, 0], 16.0)
    np.testing.assert_allclose(g[3, 1] - g[0, 1], 16.0)

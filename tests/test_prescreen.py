"""No-miss class-prescreen path (Evaluator.detect_images_prescreened).

The prescreen skips alignment/resample/decode for classes whose correlation
ceiling cannot exceed eval.nms_score_threshold. Because the resampled
recognition score is a convex combination of correlation values, no
above-threshold detection is dropped (up to the derived rounding margin,
engine.evaluate.prescreen_margin); these tests assert that the surviving
detections match the full fused path to 1e-4 score / 1e-3 box tolerance
(the two paths fuse their einsums differently, so bitwise equality is not
expected).

Random-init backbone features are near-constant vectors (every class's
cosine ceiling is ~0.99), so partial pruning is exercised with one-hot
class-feature banks, whose per-class ceiling equals the max of one feature
channel and therefore has real spread.
"""

import numpy as np
import pytest
from PIL import Image  # noqa: F401  (parity with sibling test imports)

import jax
import jax.numpy as jnp

from os2d_tpu.config import get_default_cfg
from os2d_tpu.engine.evaluate import Evaluator, unpack_detections
from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
from os2d_tpu.models.head import ClassHead
from os2d_tpu.structures.feature_map import FeatureMapSize

IMG_W, IMG_H = 320, 256


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    cfg = get_default_cfg()
    cfg.tpu.eval_class_chunk = 2
    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    scene = rng.randint(0, 255, (IMG_H, IMG_W, 3), np.uint8)

    # one-hot class features: class k correlates with feature channel 240+k
    n_cls = 8
    feats = np.zeros((n_cls, 15, 15, 1024), np.float32)
    for k in range(n_cls):
        feats[k, :, :, 240 + k] = 1.0
    mask = np.zeros((n_cls, 15, 15), np.float32)
    mask[:, 2:-2, 2:-2] = 1.0
    mask /= mask.reshape(n_cls, -1).sum(1)[:, None, None]
    head = ClassHead(jnp.asarray(feats), jnp.asarray(mask))

    sizes = [FeatureMapSize(w=IMG_W, h=IMG_H)]
    inv = [(1.0, 1.0)]
    norm = {"mean": model_cfg.normalization_mean,
            "std": model_cfg.normalization_std}
    return cfg, model, params, scene, head, sizes, inv, norm


def _assert_rows_equal(full, pre):
    f, p = unpack_detections(full), unpack_detections(pre)
    for row in range(full.shape[1]):
        fv, pv = f["valid"][0, row], p["valid"][0, row]
        assert fv.sum() == pv.sum(), (row, fv.sum(), pv.sum())
        if fv.sum():
            np.testing.assert_allclose(
                f["boxes"][0, row][fv], p["boxes"][0, row][pv], atol=1e-3)
            np.testing.assert_allclose(
                f["scores"][0, row][fv], p["scores"][0, row][pv], atol=1e-4)


def test_prescreen_partial_prune_matches_full(setup):
    cfg, model, params, scene, head, sizes, inv, norm = setup
    ev = Evaluator(model, cfg)
    # pick a threshold between the per-class ceilings so SOME classes prune
    full0 = np.asarray(
        ev.detect_images(params, scene[None], head, sizes, inv, norm))
    per_class_max = unpack_detections(full0)["scores"][0].max(1)
    thr = float(np.median(per_class_max))
    cfg.eval.nms_score_threshold = thr

    assert ev.prescreen_applicable(head)
    full = np.asarray(
        ev.detect_images(params, scene[None], head, sizes, inv, norm))
    pre = ev.detect_images_prescreened(
        params, scene[None], head, sizes, inv, norm)
    f, p = unpack_detections(full), unpack_detections(pre)
    kept = (p["valid"][0].sum(1) > 0)
    # the median split must actually prune: some rows empty, some kept
    assert 0 < kept.sum() < head.class_feats.shape[0], kept
    _assert_rows_equal(full, pre)
    cfg.eval.nms_score_threshold = float("-inf")


def test_prescreen_all_pruned(setup):
    cfg, model, params, scene, head, sizes, inv, norm = setup
    cfg.eval.nms_score_threshold = 1.5  # above the cosine ceiling of 1.0
    ev = Evaluator(model, cfg)
    pre = ev.detect_images_prescreened(
        params, scene[None], head, sizes, inv, norm)
    assert unpack_detections(pre)["valid"].sum() == 0
    cfg.eval.nms_score_threshold = float("-inf")


def test_prescreen_not_applicable_cases(setup):
    cfg, model, params, scene, head, sizes, inv, norm = setup
    ev = Evaluator(model, cfg)
    assert not ev.prescreen_applicable(head)  # -inf threshold
    cfg.eval.nms_score_threshold = 0.5
    assert ev.prescreen_applicable(head)
    cfg.eval.nms_across_classes = True
    assert ev.prescreen_applicable(head)  # padded rows are score-masked (r3)
    cfg.eval.nms_across_classes = False
    cfg.tpu.eval_class_prescreen = False
    assert not ev.prescreen_applicable(head)
    cfg.tpu.eval_class_prescreen = True
    cfg.eval.nms_score_threshold = float("-inf")


def test_prescreen_nms_across_classes_matches_full(setup):
    """With joint (across-class) NMS the prescreen's padded duplicate rows
    are score-masked to -inf in phase 2, so they cannot suppress genuine
    detections; the surviving rows must match the full fused path."""
    cfg, model, params, scene, head, sizes, inv, norm = setup
    cfg.eval.nms_across_classes = True
    ev = Evaluator(model, cfg)
    full0 = np.asarray(
        ev.detect_images(params, scene[None], head, sizes, inv, norm))
    per_class_max = unpack_detections(full0)["scores"][0].max(1)
    thr = float(np.median(per_class_max))
    cfg.eval.nms_score_threshold = thr
    assert ev.prescreen_applicable(head)

    full = np.asarray(
        ev.detect_images(params, scene[None], head, sizes, inv, norm))
    pre = ev.detect_images_prescreened(
        params, scene[None], head, sizes, inv, norm)
    kept = (unpack_detections(pre)["valid"][0].sum(1) > 0)
    assert 0 < kept.sum() < head.class_feats.shape[0], kept
    _assert_rows_equal(full, pre)
    cfg.eval.nms_score_threshold = float("-inf")
    cfg.eval.nms_across_classes = False


def test_evaluate_routes_through_prescreen(tmp_path):
    """evaluate() with a finite nms_score_threshold uses the prescreened
    fused path and reproduces the default-path metrics on planted patches."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_end_to_end_eval import make_synthetic_dataset, IMG_W as EW

    from os2d_tpu.data.dataset import DatasetOneShotDetection
    from os2d_tpu.data.dataloader import DataloaderOneShotDetection
    from os2d_tpu.engine.evaluate import evaluate

    root = str(tmp_path)
    df = make_synthetic_dataset(root)
    import os

    dataset = DatasetOneShotDetection(
        df, gt_path=os.path.join(root, "classes", "images"),
        image_path=os.path.join(root, "src"), name="prescreen-ds",
        image_size=EW, eval_scale=EW, cache_images=True)
    loader = DataloaderOneShotDetection(
        dataset=dataset, batch_size=1, pyramid_scales_eval=[1.0],
        do_augmentation=False)

    cfg = get_default_cfg()
    cfg.eval.mAP_iou_thresholds = [0.5]
    cfg.tpu.eval_class_chunk = 4
    cfg.tpu.eval_pre_top_k = 512
    cfg.tpu.eval_top_k = 64

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)

    base = evaluate(loader, model, params, cfg)
    cfg.eval.nms_score_threshold = 0.5  # planted patches score ~1.0
    pre = evaluate(loader, model, params, cfg)
    assert pre["mAP@0.50"] == base["mAP@0.50"] == 1.0, (base, pre)


def test_prescreen_with_tta_views(setup):
    """Class TTA (num_views=4) with a chunk size that does NOT divide the
    padded row count: the view-split must trim to view-aligned rows
    (regression for a shape-mismatch crash) and match the full path."""
    cfg, model, params, scene, head, sizes, inv, norm = setup
    from os2d_tpu.engine.evaluate import augment_class_images

    # expand 2 base classes into rotation90 views -> 8 rows, chunk=3 so the
    # padded row count (9) is not a multiple of num_views
    feats = np.asarray(head.class_feats[:2])
    views = []
    for f in feats:
        views += [f, np.rot90(f, 1, (0, 1)), np.rot90(f, 2, (0, 1)),
                  np.rot90(f, 3, (0, 1))]
    mask = np.tile(np.asarray(head.pool_mask[:1]), (8, 1, 1))
    tta_head = ClassHead(jnp.asarray(np.stack(views)), jnp.asarray(mask))

    cfg.tpu.eval_class_chunk = 3
    cfg.eval.nms_score_threshold = -1.0  # finite, keeps every class
    ev = Evaluator(model, cfg)
    full = np.asarray(ev.detect_images(
        params, scene[None], tta_head, sizes, inv, norm, num_views=4))
    pre = ev.detect_images_prescreened(
        params, scene[None], tta_head, sizes, inv, norm, num_views=4)
    assert pre.shape == full.shape == (1, 2, cfg.tpu.eval_top_k, 6)
    _assert_rows_equal(full, pre)
    cfg.eval.nms_score_threshold = float("-inf")
    cfg.tpu.eval_class_chunk = 2


def test_per_level_class_chunks_match_uniform(setup):
    """Asymmetric per-level class chunks (cfg.tpu.eval_class_chunk_per_level,
    r4): smaller pyramid levels run larger chunks — pure scheduling, so
    detections must match the uniform-chunk program exactly."""
    cfg0, model, params, scene, head, _, _, norm = setup

    sizes = [FeatureMapSize(w=IMG_W, h=IMG_H),
             FeatureMapSize(w=IMG_W // 2, h=IMG_H // 2)]
    inv = [(1.0, 1.0), (2.0, 2.0)]

    import copy

    results = {}
    for per_level in (False, True):
        cfg = copy.deepcopy(cfg0)
        cfg.tpu.eval_class_chunk = 2  # 8 classes -> 4 chunks at the big level
        cfg.tpu.eval_class_chunk_per_level = per_level
        ev = Evaluator(model, cfg)
        packed = ev.detect_images(
            params, scene[None], head, sizes, inv, norm)
        results[per_level] = unpack_detections(np.asarray(packed))

    a, b = results[False], results[True]
    assert (a["valid"] == b["valid"]).all()
    v = a["valid"]
    np.testing.assert_allclose(a["scores"][v], b["scores"][v], atol=1e-5)
    np.testing.assert_allclose(a["boxes"][v], b["boxes"][v], atol=1e-4)

"""End-to-end eval slice: synthetic dataset with planted class patches.

Even with random backbone weights, a class image planted verbatim in the scene
at the anchor size (240x240) produces near-identical features, so the
correlation score peaks at the planted location and the identity-initialized
aligner decodes the box there. This exercises dataset -> dataloader ->
backbone -> class heads -> head -> decode -> NMS -> VOC mAP end to end.
"""

import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from os2d_tpu.config import get_default_cfg
from os2d_tpu.data.dataset import DatasetOneShotDetection
from os2d_tpu.data.dataloader import DataloaderOneShotDetection
from os2d_tpu.engine.evaluate import evaluate
from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params

IMG_W, IMG_H = 640, 480
PATCH = 240


def make_synthetic_dataset(root):
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "classes", "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "src"), exist_ok=True)

    # class images: structured random textures
    class_patches = {}
    for cid in (0, 1):
        patch = rng.randint(0, 255, (PATCH // 8, PATCH // 8, 3), np.uint8)
        patch = np.kron(patch, np.ones((8, 8, 1), np.uint8))  # blocky texture
        class_patches[cid] = patch
        Image.fromarray(patch).save(
            os.path.join(root, "classes", "images", f"class{cid}.jpg"), quality=95
        )

    # scene images with planted patches at anchor-aligned positions
    rows = []
    planted = {0: [(48, 48, 0)], 1: [(336, 176, 1), (48, 112, 0)]}
    for image_id, plants in planted.items():
        img = rng.randint(0, 60, (IMG_H, IMG_W, 3), np.uint8)
        for (x0, y0, cid) in plants:
            img[y0: y0 + PATCH, x0: x0 + PATCH] = class_patches[cid]
            rows.append(
                dict(
                    imageid=image_id,
                    imagefilename=f"img{image_id}.jpg",
                    classid=cid,
                    classfilename=f"class{cid}.jpg",
                    gtbboxid=len(rows),
                    difficult=0,
                    lx=x0 / IMG_W,
                    ty=y0 / IMG_H,
                    rx=(x0 + PATCH) / IMG_W,
                    by=(y0 + PATCH) / IMG_H,
                )
            )
        Image.fromarray(img).save(
            os.path.join(root, "src", f"img{image_id}.jpg"), quality=95
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def synthetic_loader(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    df = make_synthetic_dataset(root)
    dataset = DatasetOneShotDetection(
        df,
        gt_path=os.path.join(root, "classes", "images"),
        image_path=os.path.join(root, "src"),
        name="synth-test",
        image_size=IMG_W,
        eval_scale=IMG_W,
        cache_images=True,
    )
    return DataloaderOneShotDetection(
        dataset=dataset, batch_size=1, pyramid_scales_eval=[1.0],
        do_augmentation=False,
    )


def test_end_to_end_eval_detects_planted_patches(synthetic_loader):
    cfg = get_default_cfg()
    cfg.eval.mAP_iou_thresholds = [0.5]
    cfg.tpu.eval_class_chunk = 4
    cfg.tpu.eval_pre_top_k = 512
    cfg.tpu.eval_top_k = 64

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)

    results = evaluate(synthetic_loader, model, params, cfg)
    assert "mAP@0.50" in results
    # planted identical patches must be found even with random features
    assert results["mAP@0.50"] > 0.9, results


def test_eval_with_loss_metrics(synthetic_loader):
    """criterion=ObjectiveConfig adds averaged loss metrics to eval results;
    the fused path computes them ON DEVICE and must match the chunked path
    (which replays encode/remap per image on host-returned level scores)."""
    from os2d_tpu.engine.objective import ObjectiveConfig

    cfg = get_default_cfg()
    cfg.eval.mAP_iou_thresholds = [0.5]
    cfg.tpu.eval_class_chunk = 4
    cfg.tpu.eval_pre_top_k = 256
    cfg.tpu.eval_top_k = 32

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)

    results = evaluate(synthetic_loader, model, params, cfg,
                       criterion=ObjectiveConfig())
    assert "loss" in results and np.isfinite(results["loss"])
    assert "loc_smoothL1" in results

    cfg.tpu.device_side_pyramid = False  # force the chunked path
    chunked = evaluate(synthetic_loader, model, params, cfg,
                       criterion=ObjectiveConfig())
    for k, v in chunked.items():
        if k == "eval_time":
            continue
        assert np.isclose(results[k], v, atol=2e-4, rtol=1e-3), (
            k, results[k], v)


def test_eval_visualization_hooks(synthetic_loader, tmp_path):
    """cfg.visualization.eval flags save detection/GT figures per image."""
    import glob

    cfg = get_default_cfg()
    cfg.eval.mAP_iou_thresholds = [0.5]
    cfg.tpu.eval_class_chunk = 4
    cfg.tpu.eval_pre_top_k = 256
    cfg.tpu.eval_top_k = 32
    cfg.output.path = str(tmp_path)
    cfg.visualization.eval.show_detections = True
    cfg.visualization.eval.show_gt_boxes = True
    cfg.visualization.eval.max_detections = 5

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    evaluate(synthetic_loader, model, params, cfg)

    figs = glob.glob(str(tmp_path / "viz_*" / "*.png"))
    assert any("detections_" in f for f in figs)
    assert any("gt_" in f for f in figs)


def test_eval_classic_path_batch2(synthetic_loader):
    """batch_size=2 now routes through the FUSED path as one batched dispatch
    per image pair (partial tail batches padded) and still detects."""
    cfg = get_default_cfg()
    cfg.eval.mAP_iou_thresholds = [0.5]
    cfg.eval.batch_size = 2
    cfg.tpu.eval_class_chunk = 4
    cfg.tpu.eval_pre_top_k = 256
    cfg.tpu.eval_top_k = 32

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    results = evaluate(synthetic_loader, model, params, cfg)
    assert results["mAP@0.50"] > 0.9, results


def test_detect_images_matches_single():
    """The batched fused program must reproduce per-image results exactly
    (same weights, same levels): detect_images[i] == detect_single_image(i)."""
    from os2d_tpu.engine.evaluate import Evaluator
    from os2d_tpu.structures.feature_map import FeatureMapSize

    rng = np.random.RandomState(0)
    cfg = get_default_cfg()
    cfg.tpu.eval_class_chunk = 3
    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    head = model.build_class_head_from_images(
        params,
        [jnp.asarray(rng.randn(240, 240, 3).astype(np.float32))
         for _ in range(5)],
    )
    ev = Evaluator(model, cfg)
    img_w, img_h = 320, 256
    sizes = [FeatureMapSize(w=256, h=192), FeatureMapSize(w=img_w, h=img_h)]
    inv = [(img_w / s.w, img_h / s.h) for s in sizes]
    norm = {"mean": model_cfg.normalization_mean,
            "std": model_cfg.normalization_std}
    imgs = rng.randint(0, 255, (3, img_h, img_w, 3), np.uint8)
    batched = np.asarray(ev.detect_images(params, imgs, head, sizes, inv, norm))
    for i in range(3):
        single = np.asarray(
            ev.detect_single_image(params, imgs[i], head, sizes, inv, norm))
        np.testing.assert_allclose(single, batched[i], atol=2e-4, rtol=1e-4)


def test_eval_fold_bn_matches(synthetic_loader):
    """cfg.tpu.fold_bn folds frozen BN into convs; detections must survive."""
    cfg = get_default_cfg()
    cfg.eval.mAP_iou_thresholds = [0.5]
    cfg.tpu.eval_class_chunk = 4
    cfg.tpu.eval_pre_top_k = 512
    cfg.tpu.eval_top_k = 64
    cfg.tpu.fold_bn = True

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    results = evaluate(synthetic_loader, model, params, cfg)
    assert results["mAP@0.50"] > 0.9, results


def test_eval_saves_detections(synthetic_loader, tmp_path):
    """cfg.visualization.eval.path_to_save_detections dumps raw detections
    (reference evaluate.py:136-149, pickle instead of torch.save)."""
    import pickle

    cfg = get_default_cfg()
    cfg.eval.mAP_iou_thresholds = [0.5]
    cfg.tpu.eval_class_chunk = 4
    cfg.tpu.eval_pre_top_k = 256
    cfg.tpu.eval_top_k = 32
    cfg.visualization.eval.path_to_save_detections = str(tmp_path / "dets")

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    evaluate(synthetic_loader, model, params, cfg)

    path = tmp_path / "dets" / f"{synthetic_loader.get_name()}_detections.pkl"
    assert path.exists()
    with open(path, "rb") as f:
        data = pickle.load(f)
    n = len(data["image_ids"])
    assert n == 2  # the synthetic dataset has two scenes
    for key in ("boxes_xyxy", "labels", "scores",
                "gt_boxes_xyxy", "gt_labels", "gt_difficults"):
        assert len(data[key]) == n, key
    assert all(b.shape[1] == 4 for b in data["boxes_xyxy"] if len(b))


def test_eval_class_heatmaps(synthetic_loader, tmp_path):
    """show_class_heatmaps saves per-class per-level score heatmap figures."""
    import glob

    cfg = get_default_cfg()
    cfg.eval.mAP_iou_thresholds = [0.5]
    cfg.tpu.eval_class_chunk = 4
    cfg.tpu.eval_pre_top_k = 256
    cfg.tpu.eval_top_k = 32
    cfg.output.path = str(tmp_path)
    cfg.visualization.eval.show_class_heatmaps = True
    cfg.visualization.eval.images_for_heatmaps = [0]
    cfg.visualization.eval.labels_for_heatmaps = [1]

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    evaluate(synthetic_loader, model, params, cfg)

    figs = glob.glob(str(tmp_path / "viz_*" / "heatmap_0_cls1_lvl*.png"))
    assert figs, "no heatmap figures saved"
    # only the requested image/label combination
    assert not glob.glob(str(tmp_path / "viz_*" / "heatmap_1_*.png"))
    assert not glob.glob(str(tmp_path / "viz_*" / "heatmap_0_cls0_*.png"))

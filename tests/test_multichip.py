"""Multi-chip sharding on the virtual 8-device CPU mesh.

Validates the two scaling strategies of DESIGN.md §3: data-parallel training
(gradient psum over the mesh) and class-sharded evaluation (each device scores
a slice of the class bank), with numerical equivalence to single-device runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
from os2d_tpu.models.head import ClassHead
from os2d_tpu.parallel import make_mesh, replicate, shard_classes


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    return model_cfg, model, params


def test_class_sharded_head_matches_single_device(setup):
    model_cfg, model, params = setup
    rng = np.random.RandomState(0)
    mesh = make_mesh(8)

    images = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32))
    class_images = jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32))
    fm = model.extract_features(params, images)
    class_head = model.build_class_head_from_images(params, list(class_images))

    out_single = model.apply_head(params, fm, class_head)

    params_r = replicate(mesh, params)
    feats_s, mask_s = shard_classes(mesh, class_head.class_feats,
                                    class_head.pool_mask)
    with mesh:
        out_sharded = model.apply_head(
            params_r, jax.device_put(fm), ClassHead(feats_s, mask_s)
        )
    np.testing.assert_allclose(
        np.asarray(out_sharded["cls"]), np.asarray(out_single["cls"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded["loc"]), np.asarray(out_single["loc"]),
        rtol=1e-3, atol=1e-4,
    )
    # the class axis really is distributed
    shard_devs = {s.device.id for s in out_sharded["cls"].addressable_shards}
    assert len(shard_devs) == 8


def test_class_sharded_evaluate_same_map(setup, tmp_path):
    """Full evaluate() with a mesh reproduces the single-device mAP."""
    from test_end_to_end_eval import make_synthetic_dataset

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataset import DatasetOneShotDetection
    from os2d_tpu.data.dataloader import DataloaderOneShotDetection
    from os2d_tpu.engine.evaluate import evaluate

    model_cfg, model, params = setup
    df = make_synthetic_dataset(str(tmp_path))
    dataset = DatasetOneShotDetection(
        df, gt_path=str(tmp_path / "classes" / "images"),
        image_path=str(tmp_path / "src"), name="synth-mc",
        image_size=640, eval_scale=640, cache_images=True,
    )
    loader = DataloaderOneShotDetection(
        dataset=dataset, batch_size=1, pyramid_scales_eval=[1.0],
        do_augmentation=False,
    )
    cfg = get_default_cfg()
    cfg.tpu.eval_class_chunk = 8
    cfg.tpu.eval_pre_top_k = 256
    cfg.tpu.eval_top_k = 32

    res_single = evaluate(loader, model, params, cfg)
    res_sharded = evaluate(loader, model, params, cfg, mesh=make_mesh(8))
    assert res_sharded["mAP@0.50"] == pytest.approx(
        res_single["mAP@0.50"], abs=1e-6
    )
    assert res_sharded["mAP@0.50"] > 0.9


def test_image_sharded_evaluate_same_map(setup, tmp_path):
    """cfg.tpu.eval_shard_axis='images': each device owns a slice of the
    image batch (eval.batch_size = mesh size); mAP matches single-device."""
    from test_end_to_end_eval import make_synthetic_dataset

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataset import DatasetOneShotDetection
    from os2d_tpu.data.dataloader import DataloaderOneShotDetection
    from os2d_tpu.engine.evaluate import evaluate

    model_cfg, model, params = setup
    df = make_synthetic_dataset(str(tmp_path))
    dataset = DatasetOneShotDetection(
        df, gt_path=str(tmp_path / "classes" / "images"),
        image_path=str(tmp_path / "src"), name="synth-imgshard",
        image_size=640, eval_scale=640, cache_images=True,
    )
    loader = DataloaderOneShotDetection(
        dataset=dataset, batch_size=1, pyramid_scales_eval=[1.0],
        do_augmentation=False,
    )
    cfg = get_default_cfg()
    cfg.tpu.eval_class_chunk = 8
    cfg.tpu.eval_pre_top_k = 256
    cfg.tpu.eval_top_k = 32

    res_single = evaluate(loader, model, params, cfg)

    cfg.eval.batch_size = 8
    cfg.tpu.eval_shard_axis = "images"
    res_sharded = evaluate(loader, model, params, cfg, mesh=make_mesh(8))
    cfg.eval.batch_size = 1
    cfg.tpu.eval_shard_axis = "classes"
    assert res_sharded["mAP@0.50"] == pytest.approx(
        res_single["mAP@0.50"], abs=1e-6
    )
    assert res_sharded["mAP@0.50"] > 0.9


def test_prescreened_evaluate_composes_with_class_sharding(setup, tmp_path):
    """Lossless class prescreen x class-sharded mesh: both phases shard
    their class chunks; mAP matches the single-device prescreened run."""
    from test_end_to_end_eval import make_synthetic_dataset

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataset import DatasetOneShotDetection
    from os2d_tpu.data.dataloader import DataloaderOneShotDetection
    from os2d_tpu.engine.evaluate import evaluate

    model_cfg, model, params = setup
    df = make_synthetic_dataset(str(tmp_path))
    dataset = DatasetOneShotDetection(
        df, gt_path=str(tmp_path / "classes" / "images"),
        image_path=str(tmp_path / "src"), name="synth-prescreen-mc",
        image_size=640, eval_scale=640, cache_images=True,
    )
    loader = DataloaderOneShotDetection(
        dataset=dataset, batch_size=1, pyramid_scales_eval=[1.0],
        do_augmentation=False,
    )
    cfg = get_default_cfg()
    cfg.tpu.eval_class_chunk = 8
    cfg.tpu.eval_pre_top_k = 256
    cfg.tpu.eval_top_k = 32
    cfg.eval.nms_score_threshold = 0.5  # planted patches score ~1.0

    res_single = evaluate(loader, model, params, cfg)
    res_sharded = evaluate(loader, model, params, cfg, mesh=make_mesh(8))
    cfg.eval.nms_score_threshold = float("-inf")
    assert res_sharded["mAP@0.50"] == pytest.approx(
        res_single["mAP@0.50"], abs=1e-6
    )
    assert res_sharded["mAP@0.50"] > 0.9

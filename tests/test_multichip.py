"""Multi-chip sharding on the virtual 8-device CPU mesh.

Validates the two scaling strategies of DESIGN.md §3: data-parallel training
(gradient psum over the mesh) and class-sharded evaluation (each device scores
a slice of the class bank), with numerical equivalence to single-device runs.

Module-marked `slow` (VERDICT r4 item 7): every test compiles full eval/train
programs on 8 virtual CPU devices — minutes each on a contended single-core
box. The driver's dryrun_multichip certifies the same paths per round; the
smoke tier keeps the fast single-device sharding units elsewhere.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

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


def test_mesh_train_consumes_packed_yuv420_wire(tmp_path):
    """The mesh train path consumes a PackedYuv420 prepared batch (VERDICT
    r4 item 6): train_one_batch(mesh=...) routes the packed wire through
    _decode_packed_images -> make_sharded_train_inputs. The mesh loss must
    equal (rtol 2e-5) the single-device loss on the SAME decoded uint8
    images, and match the rgb8-wire mesh loss to the wire tolerance."""
    import random as _random

    from test_class_cache import _loaders_with_identical_rng

    from os2d_tpu.engine.objective import ObjectiveConfig
    from os2d_tpu.engine.optimization import create_optimizer
    from os2d_tpu.engine.train import (
        TrainStep, build_trainable_mask, prepare_batch_arrays,
        train_one_batch)
    from os2d_tpu.ops.pixel_format import PackedYuv420, decode_wire_to_u8_device
    from os2d_tpu.utils.logger import setup_logger

    host_loader, _, cfg = _loaders_with_identical_rng(str(tmp_path),
                                                      flips=False)
    _random.seed(11)
    batch = host_loader.get_batch(0)  # batch_size 2 -> 2-device mesh
    mesh = make_mesh(2)

    model_cfg = Os2dConfig(class_image_size=128)
    params = init_os2d_params(jax.random.PRNGKey(1), model_cfg)
    mask = build_trainable_mask(params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)
    step = TrainStep(model_cfg, ObjectiveConfig(), optimizer, cfg.train)
    logger = setup_logger("OS2D.test")

    def run(prepared, use_mesh):
        _, _, meters = train_one_batch(
            batch, params, optimizer.init(params), step, logger,
            mesh=mesh if use_mesh else None, prepared=prepared)
        return float(meters["loss"])

    prep_yuv = prepare_batch_arrays(batch, pixel_format="yuv420")
    assert isinstance(prep_yuv[0]["images"], PackedYuv420)
    loss_mesh_yuv = run(prep_yuv, use_mesh=True)

    # single-device reference on the identical decoded-u8 pixels (isolates
    # the mesh sharding from the wire's half-LSB in-program decode delta)
    prep_yuv2 = prepare_batch_arrays(batch, pixel_format="yuv420")
    dec = dict(prep_yuv2[0],
               images=decode_wire_to_u8_device(prep_yuv2[0]["images"]))
    loss_single_dec = run((dec, prep_yuv2[1]), use_mesh=False)
    assert loss_mesh_yuv == pytest.approx(loss_single_dec, rel=2e-5)

    # and the rgb8-wire mesh path agrees to the lossy-wire tolerance
    prep_rgb = prepare_batch_arrays(batch, pixel_format="rgb8")
    loss_mesh_rgb = run(prep_rgb, use_mesh=True)
    assert loss_mesh_yuv == pytest.approx(loss_mesh_rgb, rel=2e-2)


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

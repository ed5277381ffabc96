"""Training engine smoke tests: jitted train step + trainval loop."""

import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from os2d_tpu.config import get_default_cfg
from os2d_tpu.data.dataset import DatasetOneShotDetection
from os2d_tpu.data.dataloader import build_train_dataloader_from_config
from os2d_tpu.engine.objective import ObjectiveConfig
from os2d_tpu.engine.optimization import create_optimizer, get_learning_rate
from os2d_tpu.engine.train import (
    TrainStep,
    build_trainable_mask,
    train_one_batch,
    trainval_loop,
)
from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
from os2d_tpu.utils.logger import setup_logger

IMG_W, IMG_H, PATCH = 480, 384, 240


def make_dataset(root, rng):
    os.makedirs(os.path.join(root, "classes", "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "src"), exist_ok=True)
    patches = {}
    for cid in (0, 1):
        p = rng.randint(0, 255, (PATCH // 8, PATCH // 8, 3), np.uint8)
        patches[cid] = np.kron(p, np.ones((8, 8, 1), np.uint8))
        Image.fromarray(patches[cid]).save(
            os.path.join(root, "classes", "images", f"class{cid}.jpg")
        )
    rows = []
    for image_id in range(3):
        img = rng.randint(0, 60, (IMG_H, IMG_W, 3), np.uint8)
        for cid in (0, 1):
            x0 = rng.randint(0, IMG_W - PATCH)
            y0 = rng.randint(0, IMG_H - PATCH)
            img[y0: y0 + PATCH, x0: x0 + PATCH] = patches[cid]
            rows.append(
                dict(imageid=image_id, imagefilename=f"img{image_id}.jpg",
                     classid=cid, classfilename=f"class{cid}.jpg",
                     gtbboxid=len(rows), difficult=0,
                     lx=x0 / IMG_W, ty=y0 / IMG_H,
                     rx=(x0 + PATCH) / IMG_W, by=(y0 + PATCH) / IMG_H,
                     split="train")
            )
        Image.fromarray(img).save(os.path.join(root, "src", f"img{image_id}.jpg"))
    df = pd.DataFrame(rows)
    return DatasetOneShotDetection(
        df, gt_path=os.path.join(root, "classes", "images"),
        image_path=os.path.join(root, "src"), name="synth-train",
        image_size=IMG_W, eval_scale=IMG_W, cache_images=True,
    )


@pytest.fixture(scope="module")
def train_setup(tmp_path_factory):
    rng = np.random.RandomState(0)
    root = str(tmp_path_factory.mktemp("train"))
    dataset = make_dataset(root, rng)

    cfg = get_default_cfg()
    cfg.train.batch_size = 2
    cfg.train.class_batch_size = 4
    # patch must fit the 240px planted objects so positive anchors exist
    cfg.train.augment.train_patch_width = 320
    cfg.train.augment.train_patch_height = 320
    cfg.train.augment.scale_jitter = 1.0
    cfg.train.augment.jitter_aspect_ratio = 1.0
    cfg.model.class_image_size = 128
    cfg.eval.train_subset_for_eval_size = 0
    cfg.train.optim.lr = 1e-3

    dataloader, _ = build_train_dataloader_from_config(
        cfg, dataset_train=dataset
    )
    model_cfg = Os2dConfig(class_image_size=128)
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(1), model_cfg)
    return cfg, dataloader, model_cfg, model, params


def test_train_step_runs_and_updates(train_setup):
    cfg, dataloader, model_cfg, model, params = train_setup
    logger = setup_logger("OS2D.test")

    obj_cfg = ObjectiveConfig()
    mask = build_trainable_mask(params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)
    opt_state = optimizer.init(params)

    step = TrainStep(model_cfg, obj_cfg, optimizer, cfg.train)
    batch = dataloader.get_batch(0)
    assert batch["images"].shape[1:] == (320, 320, 3)
    assert len({im.shape for im in batch["class_images"]}) == 1

    # the final aligner layer is zero-init (identity transform) so the trunk
    # sees ~zero gradients at step 0; check the final layer + backbone instead
    lin0 = np.asarray(params["transform_net"]["linear"]["w"]).copy()
    bb0 = np.asarray(params["backbone"]["layer3"][0]["conv1"]).copy()
    losses = []
    new_params = params
    for i in range(3):
        new_params, opt_state, meters = train_one_batch(
            batch, new_params, opt_state, step, logger
        )
        assert np.isfinite(meters["loss"]), meters
        assert np.isfinite(meters["grad_norm"])
        losses.append(meters["loss"])
    assert (np.asarray(new_params["transform_net"]["linear"]["w"]) != lin0).any(), (
        "aligner params did not update"
    )
    assert (np.asarray(new_params["backbone"]["layer3"][0]["conv1"]) != bb0).any(), (
        "backbone params did not update"
    )
    assert losses[-1] < losses[0] * 1.5  # no blow-up


def test_frozen_transform_params_stay_fixed(train_setup):
    cfg, dataloader, model_cfg, model, params = train_setup
    logger = setup_logger("OS2D.test")

    cfg2 = cfg.clone()
    cfg2.train.model.freeze_transform = True
    obj_cfg = ObjectiveConfig()
    mask = build_trainable_mask(params, cfg2.train)
    optimizer = create_optimizer(cfg2.train.optim, mask)
    opt_state = optimizer.init(params)
    step = TrainStep(model_cfg, obj_cfg, optimizer, cfg2.train)

    batch = dataloader.get_batch(0)
    t0 = np.asarray(params["transform_net"]["conv0"]["w"]).copy()
    b0 = np.asarray(params["backbone"]["conv1"]).copy()
    new_params, _, _ = train_one_batch(batch, params, opt_state, step, logger)
    np.testing.assert_array_equal(
        np.asarray(new_params["transform_net"]["conv0"]["w"]), t0
    )
    assert not np.allclose(np.asarray(new_params["backbone"]["conv1"]), b0)


@pytest.mark.slow
def test_trainval_loop_smoke(train_setup, tmp_path):
    cfg, dataloader, model_cfg, model, params = train_setup
    cfg2 = cfg.clone()
    cfg2.train.optim.max_iter = 2
    cfg2.eval.iter = 1000
    cfg2.output.path = str(tmp_path / "out")
    cfg2.output.save_iter = 1

    obj_cfg = ObjectiveConfig()
    mask = build_trainable_mask(params, cfg2.train)
    optimizer = create_optimizer(cfg2.train.optim, mask)
    opt_state = optimizer.init(params)

    new_params, _, full_log, _ = trainval_loop(
        dataloader, model, params, cfg2, obj_cfg, optimizer, opt_state,
        dataloaders_eval=[],
    )
    assert os.path.exists(os.path.join(cfg2.output.path, "checkpoint_iter_0.pkl"))
    assert os.path.exists(os.path.join(cfg2.output.path, "train_log.pkl"))
    assert get_learning_rate(opt_state) == pytest.approx(cfg2.train.optim.lr)


@pytest.mark.slow
def test_trainval_loop_orbax_backend(train_setup, tmp_path):
    """cfg.tpu.checkpoint_backend="orbax" routes loop checkpoints to orbax
    dirs, and the saved checkpoint loads back with intact params."""
    from os2d_tpu.utils.logger import load_checkpoint

    cfg, dataloader, model_cfg, model, params = train_setup
    cfg2 = cfg.clone()
    cfg2.train.optim.max_iter = 1
    cfg2.eval.iter = 1000
    cfg2.output.path = str(tmp_path / "out")
    cfg2.output.save_iter = 1
    cfg2.tpu.checkpoint_backend = "orbax"

    obj_cfg = ObjectiveConfig()
    mask = build_trainable_mask(params, cfg2.train)
    optimizer = create_optimizer(cfg2.train.optim, mask)
    opt_state = optimizer.init(params)

    new_params, _, _, _ = trainval_loop(
        dataloader, model, params, cfg2, obj_cfg, optimizer, opt_state,
        dataloaders_eval=[],
    )
    # the final checkpoint (iter == max_iter) must be an orbax dir + pkl stub
    pkl = os.path.join(cfg2.output.path, "checkpoint_iter_1.pkl")
    assert os.path.exists(pkl)
    assert os.path.isdir(os.path.join(cfg2.output.path, "checkpoint_iter_1.orbax"))
    ckpt = load_checkpoint(pkl)
    assert ckpt["net"] is not None
    np.testing.assert_array_equal(
        np.asarray(ckpt["net"]["backbone"]["conv1"]),
        np.asarray(new_params["backbone"]["conv1"]),
    )


@pytest.mark.slow
def test_trainval_loop_gt_boxes_dataloader_figs(train_setup, tmp_path):
    """show_gt_boxes_dataloader saves first-batch GT figures."""
    import glob

    cfg, dataloader, model_cfg, model, params = train_setup
    cfg2 = cfg.clone()
    cfg2.train.optim.max_iter = 1
    cfg2.eval.iter = 1000
    cfg2.output.path = str(tmp_path / "out")
    cfg2.output.save_iter = 1000
    cfg2.visualization.train.show_gt_boxes_dataloader = True

    obj_cfg = ObjectiveConfig()
    mask = build_trainable_mask(params, cfg2.train)
    optimizer = create_optimizer(cfg2.train.optim, mask)
    opt_state = optimizer.init(params)
    # batch 0 may be a partial bucket batch (3 images / batch 2 -> sizes 2+1,
    # order depends on prior shuffles of the shared dataloader); the loop dumps
    # figures for whatever get_batch(0) holds when it starts
    expected_figs = len(dataloader.get_batch(0)["images"])
    trainval_loop(
        dataloader, model, params, cfg2, obj_cfg, optimizer, opt_state,
        dataloaders_eval=[],
    )
    figs = glob.glob(str(tmp_path / "out" / "viz_dataloader" / "gt_batch0_*.png"))
    assert len(figs) == expected_figs
    assert expected_figs >= 1


@pytest.mark.slow
def test_trainval_loop_target_remapping_figs(train_setup, tmp_path):
    """show_target_remapping saves per-(image, positive-label) diagnostics."""
    import glob

    cfg, dataloader, model_cfg, model, params = train_setup
    cfg2 = cfg.clone()
    cfg2.train.optim.max_iter = 1
    cfg2.eval.iter = 1000
    cfg2.output.path = str(tmp_path / "out")
    cfg2.output.save_iter = 1000
    cfg2.visualization.train.show_target_remapping = True

    obj_cfg = ObjectiveConfig()
    mask = build_trainable_mask(params, cfg2.train)
    optimizer = create_optimizer(cfg2.train.optim, mask)
    opt_state = optimizer.init(params)
    trainval_loop(
        dataloader, model, params, cfg2, obj_cfg, optimizer, opt_state,
        dataloaders_eval=[],
    )
    figs = glob.glob(str(tmp_path / "out" / "viz_remapping" / "remap_*.png"))
    assert figs, "no remapping figures saved"


def test_nan_reproducer_dump_and_reload(train_setup, tmp_path):
    """A non-finite gradient dumps an error_nan_appeared-*.pkl with batch +
    weights + optimizer state; the loader restores device arrays and the
    update is skipped (reference os2d/engine/train.py:116-131)."""
    import glob

    from os2d_tpu.engine.train import load_nan_reproducer, train_one_batch
    from os2d_tpu.utils.logger import setup_logger

    cfg, dataloader, model_cfg, model, params = train_setup
    # poison one weight: the forward then produces NaN scores -> NaN grads
    bad_params = jax.tree_util.tree_map(lambda x: x, params)
    bad_params["transform_net"] = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, jnp.nan), params["transform_net"]
    )

    obj_cfg = ObjectiveConfig()
    mask = build_trainable_mask(bad_params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)
    opt_state = optimizer.init(bad_params)
    train_step = TrainStep(model_cfg, obj_cfg, optimizer, cfg.train)
    logger = setup_logger("OS2D.test_nan", None)

    batch = dataloader.get_batch(0)
    new_params, _, meters = train_one_batch(
        batch, bad_params, opt_state, train_step, logger,
        dump_dir=str(tmp_path),
    )
    assert not np.isfinite(meters["grad_norm"])
    # update skipped: finite leaves unchanged
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["conv1"]),
        np.asarray(bad_params["backbone"]["conv1"]),
    )
    dumps = glob.glob(str(tmp_path / "error_nan_appeared-*.pkl"))
    assert len(dumps) == 1
    payload = load_nan_reproducer(dumps[0])
    assert set(payload) >= {"batch_arrays", "net", "optimizer", "num_classes"}
    # the reload round-trips the exact failing step inputs
    assert payload["batch_arrays"]["images"].shape[0] == len(batch["images"])
    assert not np.isfinite(
        np.asarray(payload["net"]["transform_net"]["conv0"]["w"])
    ).any(), "poisoned weights should round-trip through the dump"
    # replaying the step reproduces the non-finite gradient
    _, _, metrics = train_step(
        payload["net"], payload["optimizer"], payload["batch_arrays"],
        payload["num_classes"],
    )
    assert not np.isfinite(float(metrics["grad_norm"]))


@pytest.mark.slow
def test_multi_step_dispatch_matches_sequential(train_setup):
    """TrainStep.multi (K steps in one lax.scan program) reproduces K
    sequential single-step dispatches: per-step metrics and the final
    params agree (the scan body IS the single-step function)."""
    from os2d_tpu.engine.train import (
        prepare_batch_arrays, stack_prepared_batches,
    )

    cfg, dataloader, model_cfg, model, params = train_setup
    obj_cfg = ObjectiveConfig()
    mask = build_trainable_mask(params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)

    # batch 0 three times: the tail batch of this tiny dataset has a smaller
    # image batch (B=1), which legitimately cannot share a scan group (the
    # loop splits such runs); augmentation still varies the three fetches
    prepared = [
        prepare_batch_arrays(dataloader.get_batch(0)) for _ in range(3)
    ]
    step = TrainStep(model_cfg, obj_cfg, optimizer, cfg.train)

    p_seq, o_seq = params, optimizer.init(params)
    metrics_seq = []
    for arrays, c_pad in prepared:
        p_seq, o_seq, m = step(p_seq, o_seq, arrays, c_pad)
        metrics_seq.append(dict(m.items()))

    stacked, c_pad = stack_prepared_batches(prepared)
    p_multi, o_multi, keys, vecs = step.multi(
        params, optimizer.init(params), stacked, c_pad
    )
    vecs = np.asarray(vecs)
    assert vecs.shape == (3, len(keys))
    for j, m_seq in enumerate(metrics_seq):
        for ki, k in enumerate(keys):
            np.testing.assert_allclose(
                vecs[j, ki], m_seq[k], rtol=5e-4, atol=1e-5,
                err_msg=f"step {j} metric {k}")
    for a, b in zip(jax.tree_util.tree_leaves(p_seq),
                    jax.tree_util.tree_leaves(p_multi)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_trainval_loop_multi_step_dispatch_matches_single(train_setup,
                                                          tmp_path):
    """trainval_loop with cfg.tpu.train_steps_per_dispatch=2 reproduces the
    single-step loop's training-loss trajectory (groups flush at the eval
    cadence; same batches via a shared seed)."""
    from os2d_tpu.utils.logger import set_random_seed

    cfg, dataloader, model_cfg, model, params = train_setup
    obj_cfg = ObjectiveConfig()

    def run(k_dispatch, out):
        cfg2 = cfg.clone()
        cfg2.train.optim.max_iter = 4
        cfg2.eval.iter = 2
        cfg2.output.path = str(tmp_path / out)
        cfg2.tpu.train_steps_per_dispatch = k_dispatch
        mask = build_trainable_mask(params, cfg2.train)
        optimizer = create_optimizer(cfg2.train.optim, mask)
        opt_state = optimizer.init(params)
        set_random_seed(7)  # global RNGs: augmentation draws in transforms
        # a FRESH loader per run: the shared fixture loader carries mutable
        # bucket-order + RNG state across runs, which changes the batch
        # sequence (measured: two identical k=1 runs differ ~0.7%)
        loader_run, _ = build_train_dataloader_from_config(
            cfg2, dataset_train=dataloader.dataset
        )
        _, _, full_log, _ = trainval_loop(
            loader_run, model, params, cfg2, obj_cfg, optimizer, opt_state,
            dataloaders_eval=[],
        )
        return np.asarray(full_log["train_loss"], np.float64)

    traj_single = run(1, "out_k1")
    traj_multi = run(2, "out_k2")
    assert traj_single.size >= 2
    np.testing.assert_allclose(traj_multi, traj_single, rtol=1e-3, atol=1e-5)


def test_batch_prefetcher_pool_ordering_and_errors():
    """Multi-worker BatchPrefetcher: in-order delivery, error surfacing, and
    backpressure (no deadlock when results are consumed slowly)."""
    import time as _time

    from os2d_tpu.engine.train import BatchPrefetcher

    class SlowLoader:
        def get_batch(self, index):
            # invert completion order: later indices finish FIRST
            _time.sleep(0.05 * (3 - (index % 4)))
            if index == 11:
                raise ValueError("boom-11")
            return {"index": index}

    pf = BatchPrefetcher(SlowLoader(), depth=4,
                         prepare_fn=lambda b: ("prep", b["index"]),
                         workers=3)
    for i in range(8):
        pf.schedule(i)
    got = [pf.get() for _ in range(8)]
    assert [g[0] for g in got] == list(range(8))  # scheduled order
    assert [g[2] for g in got] == [("prep", i) for i in range(8)]

    pf.schedule(10)
    pf.schedule(11)
    pf.schedule(12)
    assert pf.get()[0] == 10
    try:
        pf.get()
        raised = False
    except ValueError as e:
        raised = "boom-11" in str(e)
    assert raised
    assert pf.get()[0] == 12  # the pool survives a worker exception
    pf.close()

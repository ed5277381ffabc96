"""Device-resident class-image cache (os2d_tpu/data/class_cache.py):
per-batch equivalence with the host PIL path, RNG-stream alignment, and
config validation."""

import random

import numpy as np
import pandas as pd
import pytest
from PIL import Image

import jax

from os2d_tpu.config import get_default_cfg
from os2d_tpu.data.class_cache import DeviceClassCache
from os2d_tpu.data.dataset import DatasetOneShotDetection
from os2d_tpu.data.dataloader import build_train_dataloader_from_config
from os2d_tpu.data.transforms import _RESAMPLE_CHOICES
from os2d_tpu.engine.objective import ObjectiveConfig
from os2d_tpu.engine.optimization import create_optimizer
from os2d_tpu.engine.train import (
    TrainStep,
    build_trainable_mask,
    prepare_batch_arrays,
    train_one_batch,
)
from os2d_tpu.models import Os2dConfig, init_os2d_params
from os2d_tpu.utils.logger import setup_logger

IMG_W, IMG_H, PATCH = 480, 384, 240
_CONV_METHODS = {
    _RESAMPLE_CHOICES.index(m)
    for m in (Image.HAMMING, Image.BICUBIC, Image.LANCZOS, Image.BILINEAR)
}


def _make_dataset(root, rng, num_classes=4):
    import os

    os.makedirs(os.path.join(root, "classes", "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "src"), exist_ok=True)
    patches = {}
    for cid in range(num_classes):
        p = rng.randint(0, 255, (PATCH // 8, PATCH // 8, 3), np.uint8)
        patches[cid] = np.kron(p, np.ones((8, 8, 1), np.uint8))
        Image.fromarray(patches[cid]).save(
            os.path.join(root, "classes", "images", f"class{cid}.jpg"))
    rows = []
    for image_id in range(3):
        img = rng.randint(0, 60, (IMG_H, IMG_W, 3), np.uint8)
        for cid in range(num_classes):
            x0 = rng.randint(0, IMG_W - PATCH)
            y0 = rng.randint(0, IMG_H - PATCH)
            img[y0: y0 + PATCH, x0: x0 + PATCH] = patches[cid]
            rows.append(
                dict(imageid=image_id, imagefilename=f"img{image_id}.jpg",
                     classid=cid, classfilename=f"class{cid}.jpg",
                     gtbboxid=len(rows), difficult=0,
                     lx=x0 / IMG_W, ty=y0 / IMG_H,
                     rx=(x0 + PATCH) / IMG_W, by=(y0 + PATCH) / IMG_H,
                     split="train"))
        Image.fromarray(img).save(os.path.join(root, "src", f"img{image_id}.jpg"))
    return DatasetOneShotDetection(
        pd.DataFrame(rows), gt_path=os.path.join(root, "classes", "images"),
        image_path=os.path.join(root, "src"), name="synth-train",
        image_size=IMG_W, eval_scale=IMG_W, cache_images=True)


def _make_cfg(flips):
    cfg = get_default_cfg()
    cfg.train.batch_size = 2
    cfg.train.class_batch_size = 4
    cfg.train.augment.train_patch_width = 320
    cfg.train.augment.train_patch_height = 320
    cfg.train.augment.scale_jitter = 1.0
    cfg.train.augment.jitter_aspect_ratio = 1.0
    cfg.train.augment.random_flip_batches = flips
    cfg.model.class_image_size = 128
    cfg.eval.train_subset_for_eval_size = 0
    return cfg


def _loaders_with_identical_rng(tmp_path, flips):
    """Two loaders with identical internal RNG state: one host-path, one
    with the device cache attached."""
    rng = np.random.RandomState(0)
    dataset = _make_dataset(str(tmp_path), rng)
    cfg = _make_cfg(flips)
    random.seed(123)
    host_loader, _ = build_train_dataloader_from_config(cfg, dataset_train=dataset)
    random.seed(123)
    cache_loader, _ = build_train_dataloader_from_config(cfg, dataset_train=dataset)
    cache_loader.attach_device_class_cache(
        DeviceClassCache.build(cache_loader, budget_mb=256))
    return host_loader, cache_loader, cfg


def _resolved_class_arrays(batch):
    """Cache-path batch -> per-class uint8 arrays + flip/method draws."""
    g = batch["class_gather"]
    c_real = len(g["class_ids"])
    arr = np.asarray(g["cache"].gather(
        g["class_ids"], g["method_idx"], g["hflip"], g["vflip"], c_real))
    return arr, g


@pytest.mark.parametrize("flips", [False, True])
def test_cache_matches_host_path(tmp_path, flips):
    host_loader, cache_loader, _ = _loaders_with_identical_rng(tmp_path, flips)
    saw_flipped_nonconv = False
    for i in range(6):
        random.seed(1000 + i)
        hb = host_loader.get_batch(i % len(host_loader))
        random.seed(1000 + i)
        cb = cache_loader.get_batch(i % len(cache_loader))

        # batch composition identical (the RNG stream stayed aligned)
        assert list(hb["class_ids"]) == list(cb["class_gather"]["class_ids"])
        np.testing.assert_array_equal(hb["images"], cb["images"])
        np.testing.assert_array_equal(hb["gt_boxes"], cb["gt_boxes"])

        arr, g = _resolved_class_arrays(cb)
        flipped = g["hflip"] or g["vflip"]
        for row, host_img in enumerate(hb["class_images"]):
            m = g["method_idx"][row]
            if (m in _CONV_METHODS) or not flipped:
                # bit-identical: PIL convolution resampling commutes with
                # mirror flips; unflipped batches trivially agree
                np.testing.assert_array_equal(arr[row], host_img)
            else:
                # BOX/NEAREST under flips: a sub-pixel-phase-shifted (but
                # equally valid) resample — must equal resize-then-flip
                saw_flipped_nonconv = True
                cache = g["cache"]
                ref = cache.stack[cache.index_of[int(g["class_ids"][row])], m]
                ref = np.asarray(ref)
                if g["hflip"]:
                    ref = ref[:, ::-1]   # width axis
                if g["vflip"]:
                    ref = ref[::-1]      # height axis
                np.testing.assert_array_equal(arr[row], ref)
    if flips:
        # the seeds above must actually exercise the one branch that is NOT
        # bit-identical to the host path (BOX/NEAREST under a flip) — if a
        # seeding/choices change stops hitting it, fail loudly rather than
        # silently shrinking coverage (test_gather_flip_nonconv_explicit
        # covers the branch deterministically as well)
        assert saw_flipped_nonconv, (
            "no flipped BOX/NEAREST draw in 6 seeded batches; adjust seeds")


def test_gather_flip_nonconv_explicit(tmp_path):
    """Deterministic pin of the flip/non-conv device-gather path: for every
    method m and flip combination, gather(cid, m, hflip, vflip) must equal
    resize-then-flip of the cached stack row (no RNG involvement)."""
    _, cache_loader, _ = _loaders_with_identical_rng(tmp_path, flips=True)
    cache = cache_loader.device_class_cache
    cid = cache.class_ids[0]
    row = cache.index_of[cid]
    for m in range(len(_RESAMPLE_CHOICES)):
        for hflip, vflip in ((True, False), (False, True), (True, True)):
            out = np.asarray(
                cache.gather([cid], [m], hflip, vflip, 1))[0]
            ref = np.asarray(cache.stack[row, m])
            if hflip:
                ref = ref[:, ::-1]
            if vflip:
                ref = ref[::-1]
            np.testing.assert_array_equal(out, ref)


def test_cache_loss_equals_host_path(tmp_path):
    host_loader, cache_loader, cfg = _loaders_with_identical_rng(
        tmp_path, flips=False)
    model_cfg = Os2dConfig(class_image_size=128)
    params = init_os2d_params(jax.random.PRNGKey(1), model_cfg)
    obj_cfg = ObjectiveConfig()
    mask = build_trainable_mask(params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)
    logger = setup_logger("OS2D.test")

    losses = []
    for loader in (host_loader, cache_loader):
        random.seed(7)
        batch = loader.get_batch(0)
        step = TrainStep(model_cfg, obj_cfg, optimizer, cfg.train)
        _, _, meters = train_one_batch(
            batch, params, optimizer.init(params), step, logger)
        losses.append(float(meters["loss"]))
    assert losses[0] == pytest.approx(losses[1], abs=0, rel=0), losses


def test_prepared_arrays_match(tmp_path):
    host_loader, cache_loader, _ = _loaders_with_identical_rng(
        tmp_path, flips=False)
    random.seed(9)
    hb = host_loader.get_batch(0)
    random.seed(9)
    cb = cache_loader.get_batch(0)
    ha, hc = prepare_batch_arrays(hb)
    ca, cc = prepare_batch_arrays(cb)
    assert hc == cc
    assert ca["class_images"].dtype == ha["class_images"].dtype
    np.testing.assert_array_equal(
        np.asarray(ca["class_images"]), np.asarray(ha["class_images"]))
    np.testing.assert_array_equal(
        np.asarray(ca["class_valid"]), np.asarray(ha["class_valid"]))


def test_validation_refuses_incompatible_augmentation(tmp_path):
    rng = np.random.RandomState(0)
    dataset = _make_dataset(str(tmp_path), rng)
    cfg = _make_cfg(flips=False)
    cfg.train.augment.random_color_distortion = True
    loader, _ = build_train_dataloader_from_config(cfg, dataset_train=dataset)
    with pytest.raises(ValueError, match="random_color_distortion"):
        loader.attach_device_class_cache(
            DeviceClassCache.build(loader, budget_mb=256))


def test_trainval_loop_wires_cache_from_config(tmp_path):
    """cfg.tpu.device_class_cache=True builds + attaches the cache inside
    trainval_loop and trains normally."""
    from os2d_tpu.engine.train import trainval_loop
    from os2d_tpu.models import Os2dModel

    rng = np.random.RandomState(0)
    dataset = _make_dataset(str(tmp_path / "data"), rng)
    cfg = _make_cfg(flips=True)
    cfg.train.optim.max_iter = 2
    cfg.eval.iter = 2  # one eval boundary so meters_running lands in the log
    cfg.output.path = str(tmp_path / "out")
    cfg.tpu.device_class_cache = True
    loader, _ = build_train_dataloader_from_config(cfg, dataset_train=dataset)

    model_cfg = Os2dConfig(class_image_size=128)
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(1), model_cfg)
    obj_cfg = ObjectiveConfig()
    mask = build_trainable_mask(params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)

    _, _, full_log, _ = trainval_loop(
        loader, model, params, cfg, obj_cfg, optimizer,
        optimizer.init(params), dataloaders_eval=[])
    assert loader.device_class_cache is not None
    # eval-only log points (initial/final) NaN-pad the series; a genuine NaN
    # loss would have tripped trainval's finite-guard and raised instead
    train_loss = np.asarray(full_log["train_loss"], np.float64)
    assert np.isfinite(train_loss).any()


def test_budget_refusal(tmp_path):
    rng = np.random.RandomState(0)
    dataset = _make_dataset(str(tmp_path), rng)
    cfg = _make_cfg(flips=False)
    loader, _ = build_train_dataloader_from_config(cfg, dataset_train=dataset)
    with pytest.raises(ValueError, match="budget"):
        DeviceClassCache.build(loader, budget_mb=0)

"""Training-throughput bench at the reference grozi recipe.

Recipe (os2d/experiments/config_training.yml): batch 4, 600x600 train
patches, 15 classes/batch, RLL + remap, SGD — the full jitted train step
(augmented batch -> target encode -> forward -> remap -> loss -> grads ->
update) with the BatchPrefetcher overlapping host-side PIL augmentation,
exactly as trainval_loop runs it.

Prints steady-state steps/s and images/s (compile + first step excluded)
plus the host dataloader's standalone batch rate, which bounds the overlap.

Run on the TPU: python tools/bench_train.py [n_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


IMG_W, IMG_H = 960, 720
PATCH = 240
NUM_CLASSES = 15
NUM_IMAGES = 8


def make_dataset(root, rng):
    """Synthetic planted-patch dataset in the CSV schema (no real datasets
    in this environment); big enough that batches vary across steps."""
    import pandas as pd
    from PIL import Image

    os.makedirs(os.path.join(root, "src"), exist_ok=True)
    os.makedirs(os.path.join(root, "classes", "images"), exist_ok=True)
    patches = {}
    for cid in range(NUM_CLASSES):
        p = rng.randint(0, 255, (PATCH // 8, PATCH // 8, 3), np.uint8)
        patches[cid] = np.kron(p, np.ones((8, 8, 1), np.uint8))
        Image.fromarray(patches[cid]).save(
            os.path.join(root, "classes", "images", f"{cid}.jpg"), quality=95)
    rows = []
    for image_id in range(NUM_IMAGES):
        img = rng.randint(0, 80, (IMG_H, IMG_W, 3), np.uint8)
        for _ in range(3):
            cid = int(rng.randint(NUM_CLASSES))
            x0 = int(rng.randint(0, IMG_W - PATCH))
            y0 = int(rng.randint(0, IMG_H - PATCH))
            img[y0: y0 + PATCH, x0: x0 + PATCH] = patches[cid]
            rows.append(dict(
                imageid=image_id, imagefilename=f"{image_id}.jpg",
                classid=cid, classfilename=f"{cid}.jpg", gtbboxid=len(rows),
                difficult=0, lx=x0 / IMG_W, ty=y0 / IMG_H,
                rx=(x0 + PATCH) / IMG_W, by=(y0 + PATCH) / IMG_H))
        Image.fromarray(img).save(
            os.path.join(root, "src", f"{image_id}.jpg"), quality=95)
    return pd.DataFrame(rows)


def main():
    import logging

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_os2d")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataset import DatasetOneShotDetection
    from os2d_tpu.data.dataloader import build_train_dataloader_from_config
    from os2d_tpu.engine.objective import ObjectiveConfig
    from os2d_tpu.engine.optimization import create_optimizer
    from os2d_tpu.engine.train import (
        BatchPrefetcher, TrainStep, build_trainable_mask, train_one_batch,
    )
    from os2d_tpu.models import Os2dConfig, init_os2d_params

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    logger = logging.getLogger("bench_train")
    rng = np.random.RandomState(0)
    root = "/tmp/bench_train_data"
    os.makedirs(root, exist_ok=True)
    df = make_dataset(root, rng)
    dataset = DatasetOneShotDetection(
        df, gt_path=os.path.join(root, "classes", "images"),
        image_path=os.path.join(root, "src"), name="bench-train",
        image_size=IMG_W, eval_scale=IMG_W, cache_images=True)

    cfg = get_default_cfg()
    cfg.train.batch_size = 4
    cfg.train.class_batch_size = NUM_CLASSES
    loader, _ = build_train_dataloader_from_config(cfg, dataset_train=dataset)
    if os.environ.get("OS2D_DEVICE_CLASS_CACHE", "") == "1":
        from os2d_tpu.data.class_cache import DeviceClassCache

        loader.attach_device_class_cache(DeviceClassCache.build(loader))
        print("device class cache attached", flush=True)

    model_cfg = Os2dConfig()
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    obj = ObjectiveConfig()
    mask = build_trainable_mask(params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)
    opt_state = optimizer.init(params)
    step = TrainStep(model_cfg, obj, optimizer, cfg.train)

    # host dataloader standalone rate (the overlap bound)
    loader.get_batch(0)
    t0 = time.time()
    for i in range(8):
        loader.get_batch(i % len(loader))
    host_rate = 8 / (time.time() - t0)

    from functools import partial

    from os2d_tpu.engine.train import (
        _decode_packed_images, prepare_batch_arrays,
    )

    # env overrides are resolved HERE (bench tools only) and passed as
    # explicit parameters — the library reads no env (test_no_env_flags).
    # OS2D_UPLOAD_PIXEL_FORMAT: rgb8 | yuv420 | yuv420_eager | auto.
    # "yuv420_eager" measures the rejected design (decode the wire with a
    # separate device program on the prefetcher thread, before the step)
    # against the shipped packed-through-scan form.
    wire = os.environ.get("OS2D_UPLOAD_PIXEL_FORMAT", "auto")
    streams = int(os.environ.get("OS2D_UPLOAD_STREAMS", "2"))
    _prep = partial(prepare_batch_arrays, upload_streams=streams,
                    pixel_format=("yuv420" if wire == "yuv420_eager"
                                  else wire))
    if wire == "yuv420_eager":
        def prepare(batch, _p=_prep):
            arrays, c_pad = _p(batch)
            return _decode_packed_images(arrays), c_pad
    else:
        prepare = _prep
    print(f"pixel_format={wire} streams={streams}", flush=True)

    loader_workers = int(os.environ.get("OS2D_LOADER_WORKERS", "1"))
    prefetcher = BatchPrefetcher(loader, prepare_fn=prepare,
                                 workers=loader_workers)
    prefetcher.schedule(0)
    t0 = time.time()
    _, batch, prepared = prefetcher.get()
    prefetcher.schedule(1)
    params, opt_state, meters = train_one_batch(
        batch, params, opt_state, step, logger, prepared=prepared)
    print(f"compile+first step {time.time() - t0:.1f}s "
          f"(loss={meters['loss']:.4f})", flush=True)

    # OS2D_SKIP_SINGLE=1 drops the single-dispatch section so A/B legs stay
    # short enough to land inside one tunnel window (the K-group section is
    # the recommended production mode and the one the A/Bs compare)
    if os.environ.get("OS2D_SKIP_SINGLE", "") == "1":
        n_single = 0
        prefetcher.get()  # drain the scheduled batch
        prefetcher.close()
    else:
        n_single = n_steps
    t0 = time.time()
    pending_fin = None
    for i in range(1, n_single + 1):
        _, batch, prepared = prefetcher.get()
        prefetcher.schedule((i + 1) % len(loader))
        # one-behind metrics, exactly as trainval_loop runs it: read step
        # i-1's packed metric vector after dispatching step i
        params, opt_state, fin = train_one_batch(
            batch, params, opt_state, step, logger, prepared=prepared,
            defer_metrics=True)
        if pending_fin is not None:
            meters = pending_fin()
        pending_fin = fin
    if n_single:
        meters = pending_fin()  # blocks on the last step
        dt = time.time() - t0
        prefetcher.close()
        print(
            f"{n_steps} steps in {dt:.1f}s = {n_steps / dt:.2f} steps/s "
            f"({n_steps / dt * cfg.train.batch_size:.1f} img/s) at the "
            f"reference recipe (batch 4, 600px, {NUM_CLASSES} classes); host "
            f"dataloader alone: {host_rate:.2f} batches/s; final loss "
            f"{meters['loss']:.4f}",
            flush=True,
        )

    # ---- K-step dispatch groups (cfg.tpu.train_steps_per_dispatch > 1) ----
    k = int(os.environ.get("OS2D_TRAIN_K", "8"))
    if k <= 1:
        return
    from os2d_tpu.engine.train import train_k_batches

    prefetcher = BatchPrefetcher(loader, depth=k + 1,
                                 prepare_fn=prepare,
                                 workers=loader_workers)

    def get_group(g):
        for j in range(k):
            prefetcher.schedule((g * k + j) % len(loader))
        return [prefetcher.get()[2] for _ in range(k)]

    t0 = time.time()
    group = get_group(0)
    params, opt_state, fin = train_k_batches(
        group, params, opt_state, step, logger)
    fin()
    print(f"compile K={k} group took {time.time() - t0:.1f}s", flush=True)

    n_groups = max(2, n_steps // k)
    t0 = time.time()
    pending_fin = None
    for g in range(1, n_groups + 1):
        group = get_group(g)
        params, opt_state, fin = train_k_batches(
            group, params, opt_state, step, logger)
        if pending_fin is not None:
            pending_fin()
        pending_fin = fin
    meters = pending_fin()[-1]
    dt = time.time() - t0
    prefetcher.close()
    steps = n_groups * k
    print(
        f"K={k} multi-dispatch: {steps} steps in {dt:.1f}s = "
        f"{steps / dt:.2f} steps/s ({steps / dt * cfg.train.batch_size:.1f} "
        f"img/s); final loss {meters['loss']:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Paired intra-process train-wire A/B: rgb8 vs yuv420, same tunnel window.

The cross-process leg protocol (tools/run_train_wire_ab.sh) pays a multi-
minute warmup per leg, so hour-scale tunnel drift dominates the wire effect
(r5 legs: rgb8 7.75/5.86 vs yuv420 3.56/6.18 — pairs split). This tool
removes the drift axis: ONE process compiles BOTH wire programs (they
coexist in TrainStep's signature-keyed cache), then alternates
rgb8/yuv420 blocks of G K-step dispatch groups back-to-back. Adjacent
blocks share the tunnel state to within seconds; the paired per-round
deltas are the wire effect.

Also prints the host-side wire cost (rgb_to_yuv420 encode rate) and each
wire's payload MB/step, the two quantities the arithmetic argument uses.

Run on the TPU:
  OS2D_DEVICE_CLASS_CACHE=1 OS2D_LOADER_WORKERS=4 \
  python tools/bench_train_wire_pairs.py [rounds] [groups_per_block]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from bench_train import make_dataset  # noqa: E402  (same synthetic recipe)

K = int(os.environ.get("OS2D_TRAIN_K", "8"))


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
        BatchPrefetcher, TrainStep, build_trainable_mask,
        prepare_batch_arrays, train_k_batches,
    )
    from os2d_tpu.models import Os2dConfig, init_os2d_params
    from os2d_tpu.ops.pixel_format import rgb_to_yuv420

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    workers = int(os.environ.get("OS2D_LOADER_WORKERS", "4"))
    streams = int(os.environ.get("OS2D_UPLOAD_STREAMS", "2"))

    logger = logging.getLogger("bench_train_wire_pairs")
    rng = np.random.RandomState(0)
    root = "/tmp/bench_train_data"
    os.makedirs(root, exist_ok=True)
    df = make_dataset(root, rng)
    from bench_train import IMG_W, NUM_CLASSES

    dataset = DatasetOneShotDetection(
        df, gt_path=os.path.join(root, "classes", "images"),
        image_path=os.path.join(root, "src"), name="bench-train",
        image_size=IMG_W, eval_scale=IMG_W, cache_images=True)
    cfg = get_default_cfg()
    cfg.train.batch_size = 4
    cfg.train.class_batch_size = NUM_CLASSES
    loader, _ = build_train_dataloader_from_config(cfg, dataset_train=dataset)
    if os.environ.get("OS2D_DEVICE_CLASS_CACHE", "1") == "1":
        from os2d_tpu.data.class_cache import DeviceClassCache

        loader.attach_device_class_cache(DeviceClassCache.build(loader))
        print("device class cache attached", flush=True)

    model_cfg = Os2dConfig()
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    mask = build_trainable_mask(params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)
    opt_state = optimizer.init(params)
    step = TrainStep(model_cfg, ObjectiveConfig(), optimizer, cfg.train)

    # ---- host-side wire cost: encode rate + payload sizes ----
    b0 = loader.get_batch(0)
    imgs = b0["images"]
    t0 = time.perf_counter()
    for _ in range(5):
        packed = rgb_to_yuv420(imgs)
    enc_ms = (time.perf_counter() - t0) / 5 * 1000
    print(f"host rgb_to_yuv420 encode: {enc_ms:.1f} ms/batch "
          f"(payload rgb8 {imgs.nbytes / 1e6:.2f} MB -> yuv420 "
          f"{packed.data.nbytes / 1e6:.2f} MB)", flush=True)

    preps = {
        wire: partial(prepare_batch_arrays, upload_streams=streams,
                      pixel_format=wire)
        for wire in ("rgb8", "yuv420")
    }
    prefetchers = {
        wire: BatchPrefetcher(loader, depth=K + 1, prepare_fn=preps[wire],
                              workers=workers)
        for wire in ("rgb8", "yuv420")
    }

    def run_block(wire, g0, n_groups, params, opt_state):
        pf = prefetchers[wire]

        def get_group(g):
            for j in range(K):
                pf.schedule((g * K + j) % len(loader))
            return [pf.get()[2] for _ in range(K)]

        pending = None
        t0 = time.time()
        for g in range(n_groups):
            group = get_group(g0 + g)
            params, opt_state, fin = train_k_batches(
                group, params, opt_state, step, logger)
            if pending is not None:
                pending()
            pending = fin
        meters = pending()[-1]
        dt = time.time() - t0
        return params, opt_state, n_groups * K / dt, meters

    # warmup: compile both programs (order rgb8 then yuv420)
    for wire in ("rgb8", "yuv420"):
        t0 = time.time()
        params, opt_state, _, _ = run_block(wire, 0, 1, params, opt_state)
        print(f"warmup {wire}: {time.time() - t0:.1f}s", flush=True)

    rates = {"rgb8": [], "yuv420": []}
    g0 = 1
    for r in range(rounds):
        # alternate which wire leads within the pair to cancel slow drift
        order = ("rgb8", "yuv420") if r % 2 == 0 else ("yuv420", "rgb8")
        for wire in order:
            params, opt_state, rate, meters = run_block(
                wire, g0, groups, params, opt_state)
            g0 += groups
            rates[wire].append(rate)
            print(f"round {r} {wire}: {rate:.2f} steps/s "
                  f"(loss {meters['loss']:.4f})", flush=True)

    for pf in prefetchers.values():
        pf.close()
    r8 = np.asarray(rates["rgb8"])
    yv = np.asarray(rates["yuv420"])
    pair_delta = yv - r8
    print(
        f"\nrgb8   median {np.median(r8):.2f} steps/s ({r8.round(2).tolist()})"
        f"\nyuv420 median {np.median(yv):.2f} steps/s ({yv.round(2).tolist()})"
        f"\npaired delta (yuv-rgb) median {np.median(pair_delta):+.2f}, "
        f"yuv wins {(pair_delta > 0).sum()}/{rounds} rounds",
        flush=True,
    )


if __name__ == "__main__":
    main()

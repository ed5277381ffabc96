"""Benchmark: images/sec/chip at the reference eval protocol.

Workload: 1280x960 input images, the full 7-scale image pyramid
[0.5, 0.625, 0.8, 1, 1.2, 1.4, 1.6] (os2d/config.py:194), 16 query classes,
backbone + head + on-device decode/NMS per image — i.e. the reference's
headline multiscale eval (README.md:84-88 protocol) on synthetic data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes NO throughput numbers (BASELINE.md). The
V100 reference estimate of 2.0 images/sec for this exact workload is derived
in BENCH_NOTES.md from the reference's published resample micro-benchmark
(os2d/modeling/head.py:457-463) plus conv FLOP counts; vs_baseline =
ours / 2.0, so >= 3.0 meets the "3x V100" north star.
"""

import json
import os
import sys
import time

import numpy as np

V100_BASELINE_IMAGES_PER_SEC = 2.0

IMG_W, IMG_H = 1280, 960
PYRAMID = [0.5, 0.625, 0.8, 1, 1.2, 1.4, 1.6]
NUM_CLASSES = 16
NUM_IMAGES = 8  # timed images (after warmup)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_os2d"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.engine.evaluate import Evaluator
    from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
    from os2d_tpu.models.head import ClassHead
    from os2d_tpu.structures.feature_map import FeatureMapSize

    print(f"devices: {jax.devices()}", file=sys.stderr)

    import os as _os

    cfg = get_default_cfg()
    cfg.tpu.eval_class_chunk = NUM_CLASSES
    # fp32 is both the parity mode AND the fastest here: this workload is
    # resample/einsum-bound with fp32 'high'-precision MXU passes; bf16 convs
    # only add conversion traffic (measured 1.9 vs 3.0 img/s)
    model_cfg = Os2dConfig(
        compute_dtype=_os.environ.get("OS2D_BENCH_DTYPE", "float32")
    )
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)

    rng = np.random.RandomState(0)
    class_images = [
        rng.randn(240, 240, 3).astype(np.float32) for _ in range(NUM_CLASSES)
    ]
    class_head = model.build_class_head_from_images(
        params, [jnp.asarray(c) for c in class_images]
    )

    evaluator = Evaluator(model, cfg)

    level_sizes = [
        FeatureMapSize(w=int(IMG_W * s), h=int(IMG_H * s)) for s in PYRAMID
    ]
    inverse_scales = [
        (IMG_W / sz.w, IMG_H / sz.h) for sz in level_sizes
    ]
    img_norm = {"mean": model_cfg.normalization_mean,
                "std": model_cfg.normalization_std}

    def run_one_image(image_u8):
        # ONE dispatch: uint8 image -> fused pyramid/backbone/head/decode
        det = evaluator.detect_single_image(
            params, image_u8, class_head, level_sizes, inverse_scales, img_norm
        )
        # force the device->host transfer of the detections: that is the real
        # pipeline boundary, and block_until_ready is unreliable on the axon
        # tunnel platform (returns before execution completes)
        return {k: np.asarray(v) for k, v in det.items()}

    def make_pyramid(seed):
        r = np.random.RandomState(seed)
        return r.randint(0, 255, (IMG_H, IMG_W, 3), np.uint8)

    # warmup (compilation)
    t0 = time.time()
    det = run_one_image(make_pyramid(123))
    warmup_s = time.time() - t0
    print(f"warmup (compile) took {warmup_s:.1f}s", file=sys.stderr)

    # timed (set OS2D_PROFILE_DIR to capture an xprof trace)
    from os2d_tpu.utils.profiling import maybe_trace_from_env

    pyramids = [make_pyramid(i) for i in range(NUM_IMAGES)]
    t0 = time.time()
    with maybe_trace_from_env():
        for p in pyramids:
            det = run_one_image(p)
    elapsed = time.time() - t0
    images_per_sec = NUM_IMAGES / elapsed

    print(
        f"{NUM_IMAGES} images in {elapsed:.2f}s -> {images_per_sec:.3f} img/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "eval_images_per_sec_1280px_7scale_16cls",
                "value": round(images_per_sec, 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(
                    images_per_sec / V100_BASELINE_IMAGES_PER_SEC, 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

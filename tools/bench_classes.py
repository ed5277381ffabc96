"""Large-catalog eval scaling bench: seconds/image vs class count.

Round-1 baseline (chunked classic path): C=1024 @7-scale/1280px = 6.11 s/image
(chunk 128; 256 OOMed on the [C_chunk, A, 225] fp32 correlation tensor).
VERDICT r1 item 5 target: < 3 s/image single-chip via the scan-based fused
program (+ optional int8 bank).

Run: python tools/bench_classes.py [C ...]  (default 256 1024)
Env: OS2D_CHUNK (default 128), OS2D_INT8=1 for the quantized bank,
OS2D_PRESENT=<K> to build a mixed bank (K near-duplicate "present" classes +
C-K one-hot "absent" classes) and ALSO time the lossless class-prescreen
path (cfg.tpu.eval_class_prescreen at eval.nms_score_threshold=0.45, the
serving default) against the full path on the same bank.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_os2d")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.engine.evaluate import Evaluator, unpack_detections
    from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
    from os2d_tpu.models.head import quantize_class_head
    from os2d_tpu.structures.feature_map import FeatureMapSize

    IMG_W, IMG_H = 1280, 960
    PYRAMID = [0.5, 0.625, 0.8, 1, 1.2, 1.4, 1.6]
    counts = [int(a) for a in sys.argv[1:]] or [256, 1024]
    chunk = int(os.environ.get("OS2D_CHUNK", "128"))
    use_int8 = bool(os.environ.get("OS2D_INT8"))

    cfg = get_default_cfg()
    cfg.tpu.eval_class_chunk = chunk
    if os.environ.get("OS2D_CHUNK_PER_LEVEL"):
        cfg.tpu.eval_class_chunk_per_level = (
            os.environ["OS2D_CHUNK_PER_LEVEL"] == "1")
    if os.environ.get("OS2D_PRE_TOPK"):
        cfg.tpu.eval_pre_top_k = int(os.environ["OS2D_PRE_TOPK"])
    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    rng = np.random.RandomState(0)

    # one template class image -> head; replicate features to C classes with
    # noise (building 1024 class heads through the backbone takes minutes and
    # is not what this measures)
    base_head = model.build_class_head_from_images(
        params, [jnp.asarray(rng.randn(240, 240, 3).astype(np.float32))]
    )
    evaluator = Evaluator(model, cfg)
    level_sizes = [FeatureMapSize(w=int(IMG_W * s), h=int(IMG_H * s))
                   for s in PYRAMID]
    inverse_scales = [(IMG_W / sz.w, IMG_H / sz.h) for sz in level_sizes]
    img_norm = {"mean": model_cfg.normalization_mean,
                "std": model_cfg.normalization_std}
    img = rng.randint(0, 255, (IMG_H, IMG_W, 3), np.uint8)

    from os2d_tpu.models.head import ClassHead

    n_present = int(os.environ.get("OS2D_PRESENT", "0"))

    for c in counts:
        if n_present:
            # mixed bank: n_present near-duplicates of the template (high
            # correlation ceilings) + one-hot "absent" classes (low ceilings)
            feats = jnp.tile(base_head.class_feats, (n_present, 1, 1, 1))
            feats = feats + 0.01 * jax.random.normal(
                jax.random.PRNGKey(1), feats.shape, feats.dtype)
            absent = np.zeros((c - n_present, 15, 15, 1024), np.float32)
            for k in range(c - n_present):
                absent[k, :, :, k % 1024] = 1.0
            feats = jnp.concatenate([feats, jnp.asarray(absent)])
        else:
            feats = jnp.tile(base_head.class_feats, (c, 1, 1, 1))
            feats = feats + 0.01 * jax.random.normal(
                jax.random.PRNGKey(1), feats.shape, feats.dtype)
        head = ClassHead(feats, jnp.tile(base_head.pool_mask, (c, 1, 1)))
        if use_int8:
            head = quantize_class_head(head)

        def run(image):
            return np.asarray(evaluator.detect_single_image(
                params, image, head, level_sizes, inverse_scales, img_norm))

        t0 = time.time()
        run(img)
        compile_s = time.time() - t0
        dev = jax.device_put(img)
        times = []
        for _ in range(3):
            t0 = time.time()
            run(dev)
            times.append(time.time() - t0)
        med = float(np.median(times))
        print(f"C={c} chunk={chunk} int8={use_int8}: {med:.2f} s/image "
              f"(compile {compile_s:.0f}s, runs {[round(t, 2) for t in times]})",
              flush=True)

        if n_present and not use_int8:
            cfg.eval.nms_score_threshold = 0.45

            def run_pre(image):
                return evaluator.detect_images_prescreened(
                    params, image[None] if image.ndim == 3 else image,
                    head, level_sizes, inverse_scales, img_norm)

            t0 = time.time()
            out = run_pre(dev)
            compile_s = time.time() - t0
            kept = int((out[0, :, :, 5] > 0.5).any(-1).sum())
            times = []
            for _ in range(3):
                t0 = time.time()
                run_pre(dev)
                times.append(time.time() - t0)
            med = float(np.median(times))
            print(f"C={c} PRESCREEN(thr=0.45, {n_present} present, "
                  f"{kept} rows kept): {med:.2f} s/image "
                  f"(compile {compile_s:.0f}s, runs {[round(t, 2) for t in times]})",
                  flush=True)
            cfg.eval.nms_score_threshold = float("-inf")


if __name__ == "__main__":
    main()

"""Op-level profile of the fused eval program on the TPU.

Captures an xprof trace of a few fused detect dispatches at the bench
protocol and prints the top self-time ops (aggregated by op category and by
HLO name prefix), to direct compute optimization (BENCH_NOTES.md round 2:
MFU ~5%, so the bound is NOT the MXU convs — find what it IS).

Run: python tools/profile_fused.py [n_dispatches]
"""

import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def capture(n=3, logdir="/tmp/os2d_xprof"):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_os2d")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.engine.evaluate import Evaluator
    from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
    from os2d_tpu.structures.feature_map import FeatureMapSize

    IMG_W, IMG_H = 1280, 960
    PYRAMID = [0.5, 0.625, 0.8, 1, 1.2, 1.4, 1.6]
    C = int(os.environ.get("OS2D_PROFILE_C", "16"))

    cfg = get_default_cfg()
    cfg.tpu.eval_class_chunk = min(C, int(os.environ.get("OS2D_CHUNK", "128")))
    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    rng = np.random.RandomState(0)
    if C <= 32:
        class_head = model.build_class_head_from_images(
            params, [jnp.asarray(rng.randn(240, 240, 3).astype(np.float32))
                     for _ in range(C)]
        )
    else:
        # large catalogs: replicate one template's features with noise
        # (building 1024 heads through the backbone takes minutes and is
        # not what this profiles) — same shortcut as tools/bench_classes.py
        from os2d_tpu.models.head import ClassHead

        base = model.build_class_head_from_images(
            params, [jnp.asarray(rng.randn(240, 240, 3).astype(np.float32))]
        )
        feats = jnp.tile(base.class_feats, (C, 1, 1, 1))
        feats = feats + 0.01 * jax.random.normal(
            jax.random.PRNGKey(1), feats.shape, feats.dtype)
        class_head = ClassHead(feats, jnp.tile(base.pool_mask, (C, 1, 1)))
    evaluator = Evaluator(model, cfg)
    level_sizes = [FeatureMapSize(w=int(IMG_W * s), h=int(IMG_H * s))
                   for s in PYRAMID]
    inverse_scales = [(IMG_W / sz.w, IMG_H / sz.h) for sz in level_sizes]
    img_norm = {"mean": model_cfg.normalization_mean,
                "std": model_cfg.normalization_std}
    batch = int(os.environ.get("OS2D_PROFILE_BATCH", "2"))
    img = rng.randint(0, 255, (batch, IMG_H, IMG_W, 3), np.uint8)

    def run(image):
        det = evaluator.detect_images(
            params, image, class_head, level_sizes, inverse_scales, img_norm)
        return np.asarray(det)

    run(img)  # compile
    dev = jax.device_put(img)
    run(dev)  # warm

    jax.profiler.start_trace(logdir)
    for _ in range(n):
        run(dev)
    jax.profiler.stop_trace()
    return logdir


def analyze(logdir):
    """Direct XSpace parse (tbp's converter is version-skewed vs the installed
    TF in this image): aggregate device-plane event durations by HLO name."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplane = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))[-1]
    print(f"trace: {xplane}", file=sys.stderr)

    space = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        metadata = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        # per-line report first: the compute core and the async-DMA queues are
        # separate lines — flat aggregation double-counts overlapped copies
        print(f"\n==== plane: {plane.name} — per line ====")
        for line in plane.lines:
            if not line.events:
                continue
            tot = sum(ev.duration_ps for ev in line.events) / 1e12 * 1000
            span = (max(ev.offset_ps + ev.duration_ps for ev in line.events)
                    - min(ev.offset_ps for ev in line.events)) / 1e12 * 1000
            names = {}
            for ev in line.events:
                nm = metadata.get(ev.metadata_id, "?")
                names[nm] = names.get(nm, 0.0) + ev.duration_ps
            top = sorted(names.items(), key=lambda kv: -kv[1])[:4]
            top_s = "; ".join(f"{nm.split(' = ')[0][:40]} {t/1e12*1000:.1f}ms"
                              for nm, t in top)
            print(f"  line '{line.name}': {len(line.events)} ev, busy "
                  f"{tot:.1f} ms over span {span:.1f} ms | top: {top_s}")
            if line.name == "XLA Ops" and os.environ.get("OS2D_PROFILE_DEEP"):
                # compute-core detail: skip nesting wrappers (while/jit
                # aggregate their bodies, double-counting)
                flat = [(nm, t) for nm, t in names.items()
                        if not nm.lstrip("%").startswith(("while", "jit"))]
                print("  -- compute-core top 40 (while/jit bodies flattened"
                      " out) --")
                for nm, t in sorted(flat, key=lambda kv: -kv[1])[:40]:
                    print(f"   {t/1e12*1000:9.2f} ms  {nm[:130]}")
        by_name = {}
        n_events = 0
        for line in plane.lines:
            for ev in line.events:
                name = metadata.get(ev.metadata_id, "?")
                by_name[name] = by_name.get(name, 0.0) + ev.duration_ps
                n_events += 1
        if not n_events:
            continue
        total = sum(by_name.values())
        print(f"\n==== plane: {plane.name} ({n_events} events, "
              f"{total / 1e12 * 1000:.2f} ms total) ====")

        def bucket(name):
            base = name.split(".")[0].split("_")[0].lower()
            for key in ("fusion", "convolution", "dot", "copy", "transpose",
                        "reduce", "scatter", "gather", "select", "sort",
                        "while", "dynamic", "broadcast", "concatenate",
                        "bitcast", "iota", "slice", "pad", "reshape",
                        "convert", "all-reduce"):
                if key in name.lower().split(".")[0]:
                    return key
            return base

        by_bucket = {}
        for name, t in by_name.items():
            b = bucket(name)
            by_bucket[b] = by_bucket.get(b, 0.0) + t
        print("-- by op kind --")
        for b, t in sorted(by_bucket.items(), key=lambda kv: -kv[1])[:15]:
            print(f"{t / total * 100:5.1f}%  {t / 1e12 * 1000:8.2f} ms  {b}")
        print("-- top 30 ops --")
        for name, t in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{t / total * 100:5.1f}%  {t / 1e12 * 1000:8.2f} ms  "
                  f"{name[:110]}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    logdir = capture(n)
    analyze(logdir)

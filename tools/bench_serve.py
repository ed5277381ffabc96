"""Serving latency/throughput bench for the fused /detect-batch path
(VERDICT r2 item 7).

Measures, on the real device:
  - single-request latency (DetectionService.detect, B=1), and
  - batched throughput (detect_batch at OS2D_SERVE_BATCH images/dispatch),
for a C-class query catalog (OS2D_SERVE_CLASSES, default 16) at
OS2D_SERVE_SIZE canvas (default 1024 to bound compile time; production
default is service.TARGET_IMAGE_SIZE=1500).

Round 4 adds a CONCURRENT-clients leg (VERDICT r3 item 7): N parallel
clients (OS2D_SERVE_CLIENTS, default 8) issue OS2D_SERVE_REQS requests each
against the DynamicBatcher at each batch-size cap in OS2D_SERVE_CAPS
(default "1,4,8"); reports p50/p99 client latency and aggregate throughput
per cap, and verifies the prescreen path engages for a large query catalog
(OS2D_SERVE_PRESCREEN_CLASSES, default 48 >= prescreen_min_classes).

Usage: PYTHONPATH=. python tools/bench_serve.py
Prints one JSON line: {"serve_latency_ms": ..., "serve_images_per_sec": ...,
"concurrent": {cap: {...}}, ...}
"""

import json
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    import jax

    import os2d_tpu.api.service as service_mod
    from os2d_tpu.api.service import DetectionService
    from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params

    n_classes = int(os.environ.get("OS2D_SERVE_CLASSES", "16"))
    batch = int(os.environ.get("OS2D_SERVE_BATCH", "4"))
    canvas = int(os.environ.get("OS2D_SERVE_SIZE", "1024"))
    scales = tuple(float(s) for s in os.environ.get(
        "OS2D_SERVE_PYRAMID", "1.0").split(","))
    reps = int(os.environ.get("OS2D_SERVE_REPS", "5"))

    print(f"devices: {jax.devices()}", file=sys.stderr)
    service_mod.TARGET_IMAGE_SIZE = canvas

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    service = DetectionService(model, params, pyramid_scales=scales)

    rng = np.random.RandomState(0)
    patch = np.kron(rng.randint(0, 255, (30, 30, 3), np.uint8),
                    np.ones((8, 8, 1), np.uint8))
    queries = [Image.fromarray(np.roll(patch, 13 * k, axis=1))
               for k in range(n_classes)]
    scenes = []
    for i in range(batch):
        scene = rng.randint(0, 60, (canvas, canvas, 3), np.uint8)
        scene[100:340, 100 + 50 * i: 340 + 50 * i] = patch
        scenes.append(Image.fromarray(scene))

    # warmup/compile both program shapes
    t0 = time.perf_counter()
    service.detect(scenes[0], queries)
    service.detect_batch(scenes, queries)
    print(f"warmup (compile) took {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = service.detect(scenes[0], queries)
        lat.append((time.perf_counter() - t0) * 1000.0)
    assert r["scores"], "no detections on the planted patch"

    thr = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rs = service.detect_batch(scenes, queries)
        thr.append(batch / (time.perf_counter() - t0))
    assert all(x["scores"] for x in rs), "batched path lost detections"

    out = {
        "serve_latency_ms": round(float(np.median(lat)), 1),
        "serve_latency_spread_ms": [round(min(lat), 1), round(max(lat), 1)],
        "serve_images_per_sec": round(float(np.median(thr)), 2),
        "batch": batch, "classes": n_classes, "canvas": canvas,
        "pyramid": list(scales),
    }

    # ---- concurrent clients against the DynamicBatcher (VERDICT r3 #7) ----
    from concurrent.futures import ThreadPoolExecutor

    from os2d_tpu.api.service import DynamicBatcher

    n_clients = int(os.environ.get("OS2D_SERVE_CLIENTS", "8"))
    n_reqs = int(os.environ.get("OS2D_SERVE_REQS", "6"))
    caps = [int(c) for c in os.environ.get("OS2D_SERVE_CAPS", "1,4,8").split(",")]
    out["concurrent"] = {}
    for cap in caps:
        # warm the batched program at this cap's group shape before timing
        service.detect_batch(scenes[:1] * min(cap, n_clients), queries)
        batcher = DynamicBatcher(service, max_batch=cap, max_wait_ms=20.0)

        def client(k):
            lats = []
            for j in range(n_reqs):
                t0 = time.perf_counter()
                r = batcher.detect(scenes[(k + j) % len(scenes)], queries)
                lats.append((time.perf_counter() - t0) * 1000.0)
                assert r["scores"], "concurrent client lost detections"
            return lats

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_clients) as pool:
            all_lats = sum(pool.map(client, range(n_clients)), [])
        wall = time.perf_counter() - t0
        batcher.close()
        out["concurrent"][str(cap)] = {
            "p50_ms": round(float(np.percentile(all_lats, 50)), 1),
            "p99_ms": round(float(np.percentile(all_lats, 99)), 1),
            "images_per_sec": round(n_clients * n_reqs / wall, 2),
        }
        print(f"cap={cap}: p50={out['concurrent'][str(cap)]['p50_ms']} ms "
              f"p99={out['concurrent'][str(cap)]['p99_ms']} ms "
              f"{out['concurrent'][str(cap)]['images_per_sec']} img/s",
              file=sys.stderr)
    out["clients"] = n_clients

    # ---- prescreen engagement for a large catalog ----
    n_pre = int(os.environ.get("OS2D_SERVE_PRESCREEN_CLASSES", "48"))
    service_pre = DetectionService(model, params, pyramid_scales=scales,
                                   prescreen_min_classes=32,
                                   score_threshold=0.5)
    queries_pre = [Image.fromarray(np.roll(patch, 5 * k, axis=0))
                   for k in range(n_pre)]
    t0 = time.perf_counter()
    service_pre.detect(scenes[0], queries_pre)
    pre_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    service_pre.detect(scenes[0], queries_pre)
    out["prescreen_latency_ms"] = round((time.perf_counter() - t0) * 1000.0, 1)
    out["prescreen_engaged"] = service_pre.stats["prescreen_dispatches"] > 0
    assert out["prescreen_engaged"], (
        f"prescreen did not engage for {n_pre} classes: {service_pre.stats}")
    print(f"prescreen({n_pre} classes): engaged, "
          f"{out['prescreen_latency_ms']} ms (compile {pre_compile:.1f}s)",
          file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

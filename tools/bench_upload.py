"""Tunnel upload-bandwidth shootout: single-stream vs chunked-parallel.

The end-to-end eval bench is upload-bound over the axon host<->TPU tunnel
(~30 MB/s measured, BENCH_NOTES r3: B=2 needs 7.4 MB uint8/dispatch ~240 ms
vs ~190 ms compute). If that 30 MB/s is a per-stream/per-transfer limit
rather than a physical link limit, splitting each batch into k chunks and
issuing the k `jax.device_put`s from parallel threads raises aggregate
bandwidth; the chunks are re-stacked on device (cheap HBM concat).

Measures, for the bench-protocol payload ([2, 960, 1280, 3] uint8):
  1. single device_put               (the current producer path)
  2. k-way chunked parallel puts     (k = 2, 4, 8), device concat + sync
  3. two concurrent full-batch puts  (does depth-2 prefetch already
                                      aggregate? If yes, the eval loop's
                                      lookahead is leaving nothing behind.)

Run on the TPU: python tools/bench_upload.py [reps]
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

BATCH, IMG_H, IMG_W = 2, 960, 1280


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = np.random.RandomState(0)
    payload_mb = BATCH * IMG_H * IMG_W * 3 / 2**20

    def sync(x):
        np.asarray(x[..., 0, 0, 0] if x.ndim >= 3 else x)

    def fresh():
        # a new array each rep so no caching layer can elide the transfer
        return rng.randint(0, 255, (BATCH, IMG_H, IMG_W, 3), np.uint8)

    # warmup: device wake + trace caches
    sync(jax.device_put(fresh()))

    concat = jax.jit(lambda parts: jnp.concatenate(parts, axis=1))

    results = {}

    # 1. single-stream
    ts = []
    for _ in range(reps):
        a = fresh()
        t0 = time.time()
        d = jax.device_put(a)
        sync(d)
        ts.append(time.time() - t0)
    results["single"] = payload_mb / np.median(ts)
    print(f"single device_put: {results['single']:.1f} MB/s "
          f"(median of {reps}, {np.median(ts) * 1e3:.0f} ms)", flush=True)

    # 2. k-way chunked parallel
    for k in (2, 4, 8):
        pool = ThreadPoolExecutor(max_workers=k)
        ts = []
        for _ in range(reps):
            a = fresh()
            chunks = np.array_split(a, k, axis=1)  # H-axis: contiguous rows
            t0 = time.time()
            futs = [pool.submit(jax.device_put, c) for c in chunks]
            parts = [f.result() for f in futs]
            d = concat(parts)
            sync(d)
            ts.append(time.time() - t0)
        results[f"chunked_{k}"] = payload_mb / np.median(ts)
        print(f"{k}-way chunked parallel: {results[f'chunked_{k}']:.1f} MB/s "
              f"({np.median(ts) * 1e3:.0f} ms incl. device concat)",
              flush=True)
        pool.shutdown()

    # 3. two concurrent full batches (prefetch-depth-2 shape)
    pool = ThreadPoolExecutor(max_workers=2)
    ts = []
    for _ in range(reps):
        a, b = fresh(), fresh()
        t0 = time.time()
        fa = pool.submit(jax.device_put, a)
        fb = pool.submit(jax.device_put, b)
        da, db = fa.result(), fb.result()
        sync(da)
        sync(db)
        ts.append(time.time() - t0)
    results["two_batches"] = 2 * payload_mb / np.median(ts)
    print(f"two concurrent batches: {results['two_batches']:.1f} MB/s "
          f"aggregate ({np.median(ts) * 1e3:.0f} ms for both)", flush=True)
    pool.shutdown()

    best_k = max((k for k in results if k.startswith("chunked")),
                 key=lambda k: results[k])
    print(f"\nverdict: single {results['single']:.1f} MB/s, best chunked "
          f"{best_k} {results[best_k]:.1f} MB/s "
          f"({results[best_k] / results['single']:.2f}x)", flush=True)


if __name__ == "__main__":
    main()

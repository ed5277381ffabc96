"""Host->device upload helpers for thin-tunnel hosts.

The axon host<->TPU tunnel measures ~30 MB/s with hour-scale +-30% variance
(BENCH_NOTES.md); at the 1280px eval protocol the per-dispatch image upload
(7.4 MB at B=2) is the end-to-end bottleneck. If the tunnel limit is
per-stream (TCP-window-ish) rather than physical, issuing one transfer as k
parallel chunked `jax.device_put`s raises aggregate bandwidth; the chunks
are re-stacked on device (an HBM concat, ~us at these sizes).

`parallel_device_put` is the shared entry point for the eval producer, the
train prefetcher, and bench.py. Stream count comes from OS2D_UPLOAD_STREAMS
(default 1 = plain device_put; measured on-TPU before enabling —
tools/bench_upload.py is the shootout).
"""

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_pool = None


def upload_streams(default=1):
    return max(1, int(os.environ.get("OS2D_UPLOAD_STREAMS", str(default))))


def _get_pool(k):
    global _pool
    if _pool is None or _pool._max_workers < k:
        _pool = ThreadPoolExecutor(max_workers=k)
    return _pool


def parallel_device_put(arr, streams=None):
    """device_put `arr`, optionally as `streams` parallel chunked transfers.

    Returns a device array (committed, possibly still in flight — same
    async contract as jax.device_put). Chunking splits a FLAT view of the
    array into k contiguous 1-D ranges (zero host-side copies for the
    C-contiguous image batches this serves — an axis split would hand
    device_put non-contiguous views, each paying a full host memcpy first)
    and restores the shape with an on-device concat+reshape. Arrays too
    small to be worth splitting fall back to a single transfer.
    """
    import jax
    import jax.numpy as jnp

    k = upload_streams() if streams is None else max(1, int(streams))
    if k == 1 or arr.size < k or arr.nbytes < (1 << 20):
        return jax.device_put(arr)
    flat = np.ascontiguousarray(arr).reshape(-1)  # view when contiguous
    chunks = np.array_split(flat, k)              # contiguous 1-D views
    futs = [_get_pool(k).submit(jax.device_put, c) for c in chunks]
    parts = [f.result() for f in futs]
    return jnp.concatenate(parts).reshape(arr.shape)

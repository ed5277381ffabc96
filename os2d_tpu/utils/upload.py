"""Host->device upload helpers for thin-tunnel hosts.

The axon host<->TPU tunnel measures ~30 MB/s with hour-scale +-30% variance
(BENCH_NOTES.md); at the 1280px eval protocol the per-dispatch image upload
(7.4 MB at B=2) is the end-to-end bottleneck. If the tunnel limit is
per-stream (TCP-window-ish) rather than physical, issuing one transfer as k
parallel chunked `jax.device_put`s raises aggregate bandwidth; the chunks
are re-stacked on device (an HBM concat, ~us at these sizes).

`parallel_device_put` is the shared entry point for the eval producer, the
train prefetcher, and bench.py. Stream count is an explicit parameter wired
from cfg.tpu.upload_streams (default 1 = plain device_put when omitted;
measured on-TPU before enabling — tools/bench_upload.py is the shootout).
The library reads no environment variables; bench tools resolve their own
OS2D_UPLOAD_STREAMS override and pass it explicitly.
"""

import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_pool = None
# one-logical-upload-in-flight gate (serialize=True): measured on the axon
# tunnel, two CONCURRENT transfers aggregate at 12.8 MB/s vs 20.3 single
# (tools/bench_upload.py, BENCH_NOTES r3) — overlapping uploads more than
# halve bandwidth, so a producer that runs several batches ahead (the K-step
# train prefetcher) must hand transfers to the wire one at a time
_transfer_gate = threading.Lock()


def _get_pool(k):
    global _pool
    if _pool is None or _pool._max_workers < k:
        _pool = ThreadPoolExecutor(max_workers=k)
    return _pool


def _fence(dev):
    """Block until `dev`'s host->device transfer has completed.

    jax.block_until_ready is unreliable over the axon tunnel (ROADMAP.md
    environment facts); a 1-element readback is the reliable fence — the
    scalar cannot be produced before the array is resident on device.
    """
    if dev.size == 0:
        # nothing to fence; an element readback on a 0-length axis would
        # be undefined (JAX clamps gather indices, ADVICE r3)
        return
    np.asarray(dev[(0,) * dev.ndim] if dev.ndim else dev)


def parallel_device_put(arr, streams=None, serialize=False):
    """device_put `arr`, optionally as `streams` parallel chunked transfers.

    Returns a device array (committed, possibly still in flight — same
    async contract as jax.device_put). Chunking splits a FLAT view of the
    array into k contiguous 1-D ranges (zero host-side copies for the
    C-contiguous image batches this serves — an axis split would hand
    device_put non-contiguous views, each paying a full host memcpy first)
    and restores the shape with an on-device concat+reshape. Arrays too
    small to be worth splitting fall back to a single transfer.

    serialize=True routes the transfer through the global one-in-flight
    gate and blocks until it has LANDED before returning (completion
    fence): concurrent transfers contend catastrophically on thin tunnels
    (BENCH_NOTES r3), so producers that run several batches ahead trade
    the async contract for clean back-to-back wire utilization.
    """
    import jax
    import jax.numpy as jnp

    k = 1 if streams is None else max(1, int(streams))

    def _put():
        if k == 1 or arr.size < k or arr.nbytes < (1 << 20):
            return jax.device_put(arr)
        flat = np.ascontiguousarray(arr).reshape(-1)  # view when contiguous
        chunks = np.array_split(flat, k)              # contiguous 1-D views
        futs = [_get_pool(k).submit(jax.device_put, c) for c in chunks]
        parts = [f.result() for f in futs]
        return jnp.concatenate(parts).reshape(arr.shape)

    if not serialize:
        return _put()
    with _transfer_gate:
        dev = _put()
        _fence(dev)
    return dev

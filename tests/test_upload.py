"""Chunked-parallel host->device upload (utils/upload.py).

The helper must be a drop-in for jax.device_put at any stream count: same
values, any shape, any dtype — the eval producer, the train prefetcher, and
bench.py all route image batches through it (OS2D_UPLOAD_STREAMS /
cfg.tpu.upload_streams select the stream count; the r4 default is 2 on the
per-stream-limited axon tunnel, and small arrays always fall back to the
plain device_put path).
"""

import numpy as np
import pytest

from os2d_tpu.utils.upload import parallel_device_put


@pytest.mark.parametrize("streams", [1, 2, 4, 8])
def test_roundtrip_image_batch(streams):
    rng = np.random.RandomState(0)
    a = rng.randint(0, 255, (2, 512, 384, 3), np.uint8)  # >1 MB: chunks
    d = parallel_device_put(a, streams=streams)
    assert np.array_equal(np.asarray(d), a)


@pytest.mark.parametrize(
    "shape,dtype",
    [((7,), np.float32),          # too few elements to chunk -> fallback
     ((3, 2), np.int32),          # tiny: under the 1 MB floor -> fallback
     ((5, 3, 4), np.float64),     # canonicalizes (x64 off) like device_put
     ((4, 1024, 512), np.float32)],  # big enough to genuinely chunk
)
def test_roundtrip_shapes(shape, dtype):
    import jax

    rng = np.random.RandomState(1)
    a = (rng.rand(*shape) * 100).astype(dtype)
    d = parallel_device_put(a, streams=8)
    ref = jax.device_put(a)  # drop-in contract: same dtype canonicalization
    assert np.asarray(d).dtype == np.asarray(ref).dtype
    assert np.array_equal(np.asarray(d), np.asarray(ref))
    assert np.allclose(np.asarray(d), a)


def test_default_is_single_stream_and_env_free(monkeypatch):
    """Omitting `streams` means 1 (plain device_put); the library must NOT
    read OS2D_UPLOAD_STREAMS — env overrides are resolved by bench tools
    and passed explicitly (tests/test_no_env_flags.py guards the source)."""
    monkeypatch.setenv("OS2D_UPLOAD_STREAMS", "4")
    rng = np.random.RandomState(2)
    a = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)
    assert np.array_equal(np.asarray(parallel_device_put(a)), a)


@pytest.mark.parametrize("streams", [1, 2])
def test_serialized_transfer(streams):
    """serialize=True is the same drop-in, but returns only after the
    transfer has landed (one-in-flight gate + completion fence —
    BENCH_NOTES r3: concurrent in-flight uploads halve tunnel bandwidth)."""
    rng = np.random.RandomState(3)
    a = rng.randint(0, 255, (2, 512, 384, 3), np.uint8)
    d = parallel_device_put(a, streams=streams, serialize=True)
    assert np.array_equal(np.asarray(d), a)


def test_serialized_transfer_concurrent_callers():
    """The gate must be safe under concurrent producers (K-step prefetcher
    threads): every caller gets its own intact array back."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.RandomState(4)
    arrays = [rng.randint(0, 255, (1, 256, 256, 3), np.uint8)
              for _ in range(6)]
    with ThreadPoolExecutor(max_workers=3) as pool:
        devs = list(pool.map(
            lambda a: parallel_device_put(a, serialize=True), arrays))
    for a, d in zip(arrays, devs):
        assert np.array_equal(np.asarray(d), a)


def test_serialized_scalar_and_0d():
    d = parallel_device_put(np.float32(3.5), serialize=True)
    assert float(np.asarray(d)) == 3.5

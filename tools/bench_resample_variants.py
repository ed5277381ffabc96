"""Benchmark alternative formulations of the correlation resample on TPU.

The resample gather dominates eval (BENCH_NOTES.md stage profile). This
harness measures exact-equivalent variants to find the fastest lowering the
current toolchain supports:

  v_baseline   4D take_along_axis along the anchor axis (current)
  v_2d         single 2D [B*C*T, A] take_along_axis (canonical dynamic-gather shape)
  v_packed     4 corners packed into ONE gather from 4 pre-shifted corr copies
  v_pallas     Pallas kernel (ops/pallas_resample.py) if the toolchain allows

Run: PYTHONPATH=... python tools/bench_resample_variants.py [C] [HW]
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(f, *args, n=10):
    out = f(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.time() - t0) / n


def make_inputs(b=1, c=16, h=60, w=80, t_interior=121):
    rng = np.random.RandomState(0)
    th = tw = int(np.sqrt(t_interior))
    t = th * tw
    corr = jnp.asarray(rng.randn(b, c, h, w, t).astype(np.float32))
    grids = jnp.asarray(
        np.clip(rng.uniform(-1, 1, (b, c, h, w, th, tw, 2)), -1, 1).astype(np.float32)
    )
    mask = jnp.asarray(
        np.full((c, th, tw), 1.0 / t, np.float32)
    )
    return corr, grids, mask, (b, c, h, w, t, th, tw)


def prepare(corr, grids, dims):
    b, c, h, w, t, th, tw = dims
    a = h * w
    corr_t = corr.reshape(b, c, a, t).transpose(0, 1, 3, 2)  # [B, C, T, A]
    g = grids.reshape(b, c, a, th, tw, 2)
    px = ((g[..., 0] + 1) * 0.5 * (w - 1)).transpose(0, 1, 4, 3, 2).reshape(b, c, t, a)
    py = ((g[..., 1] + 1) * 0.5 * (h - 1)).transpose(0, 1, 4, 3, 2).reshape(b, c, t, a)
    return corr_t, px, py


def corners(px, py, h, w):
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    return x0i, x1i, y0i, y1i, wx, wy


def v_baseline(corr_t, px, py, mask_t, h, w):
    x0i, x1i, y0i, y1i, wx, wy = corners(px, py, h, w)

    def g(yi, xi):
        return jnp.take_along_axis(corr_t, yi * w + xi, axis=3,
                                   mode="promise_in_bounds")

    s = (g(y0i, x0i) * (1 - wx) * (1 - wy) + g(y0i, x1i) * wx * (1 - wy)
         + g(y1i, x0i) * (1 - wx) * wy + g(y1i, x1i) * wx * wy)
    return jnp.sum(s * mask_t[None, :, :, None], axis=2)


def v_2d(corr_t, px, py, mask_t, h, w):
    b, c, t, a = corr_t.shape
    x0i, x1i, y0i, y1i, wx, wy = corners(px, py, h, w)
    corr2 = corr_t.reshape(b * c * t, a)

    def g(yi, xi):
        idx = (yi * w + xi).reshape(b * c * t, a)
        return jnp.take_along_axis(corr2, idx, axis=1,
                                   mode="promise_in_bounds").reshape(b, c, t, a)

    s = (g(y0i, x0i) * (1 - wx) * (1 - wy) + g(y0i, x1i) * wx * (1 - wy)
         + g(y1i, x0i) * (1 - wx) * wy + g(y1i, x1i) * wx * wy)
    return jnp.sum(s * mask_t[None, :, :, None], axis=2)


def v_packed(corr_t, px, py, mask_t, h, w):
    """One gather from 4 pre-shifted copies: plane[i], plane[i+1], plane[i+W],
    plane[i+W+1] all at base index i = y0*w + x0 (border-clamped shifts)."""
    b, c, t, a = corr_t.shape
    x0i, x1i, y0i, y1i, wx, wy = corners(px, py, h, w)
    # build shifted copies along a new leading axis [4, B, C, T, A]
    p = corr_t.reshape(b, c, t, h, w)
    right = jnp.concatenate([p[..., 1:], p[..., -1:]], axis=-1)
    down = jnp.concatenate([p[..., 1:, :], p[..., -1:, :]], axis=-2)
    downright = jnp.concatenate([down[..., 1:], down[..., -1:]], axis=-1)
    packed = jnp.stack([p, right, down, downright], axis=0).reshape(4, b, c, t, a)
    base = y0i * w + x0i
    idx = jnp.broadcast_to(base[None], (4,) + base.shape)
    vals = jnp.take_along_axis(packed, idx, axis=4, mode="promise_in_bounds")
    # NOTE: shifted-copy values equal corner values only where the corner did
    # not clamp; with pre-clipped coords, x1i==x0i at the right border and the
    # clamped shift reproduces the border value — equivalent under clamping.
    s = (vals[0] * (1 - wx) * (1 - wy) + vals[1] * wx * (1 - wy)
         + vals[2] * (1 - wx) * wy + vals[3] * wx * wy)
    return jnp.sum(s * mask_t[None, :, :, None], axis=2)


def v_matmul(corr_t, px, py, mask_t, h, w, t_chunk=16):
    """Gather-free: bilinear sampling as two dense MXU contractions.

    Wy[t,a,h'] = hat(py - h'), Wx[t,a,w'] = hat(px - w') have exactly the
    bilinear corner weights in their (<=2)-wide support, so
    out[t,a] = Wy[t,a,:] @ corr[t,:,:] @ Wx[t,a,:] is the exact border-clamped
    bilinear sample. FLOP-heavy (A*H*W per (t, sample)) but it runs on the
    MXU instead of the scalar gather path. T is scanned in chunks to bound
    the Wy/R buffers.
    """
    b, c, t, a = corr_t.shape
    corr_p = corr_t.reshape(b, c, t, h, w)
    iota_h = jnp.arange(h, dtype=px.dtype)
    iota_w = jnp.arange(w, dtype=px.dtype)
    n_chunks = (t + t_chunk - 1) // t_chunk
    t_pad = n_chunks * t_chunk
    if t_pad != t:
        pad = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
        corr_p = jnp.pad(corr_p.reshape(b, c, t, a), pad).reshape(b, c, t_pad, h, w)
        px = jnp.pad(px, pad)
        py = jnp.pad(py, pad)
        mask_t = jnp.pad(mask_t, ((0, 0), (0, t_pad - t)))

    corr_p = corr_p.reshape(b, c, n_chunks, t_chunk, h, w)
    px = px.reshape(b, c, n_chunks, t_chunk, a)
    py = py.reshape(b, c, n_chunks, t_chunk, a)
    mask_c = mask_t.reshape(c, n_chunks, t_chunk)

    def body(carry, inputs):
        corr_i, px_i, py_i, mask_i = inputs  # [B,C,tc,...]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(py_i[..., None] - iota_h))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(px_i[..., None] - iota_w))
        prec = os.environ.get("MATMUL_PRECISION", "default")
        r = jnp.einsum("bctah,bcthw->bctaw", wy, corr_i,
                       preferred_element_type=jnp.float32, precision=prec)
        out = jnp.einsum("bctaw,bctaw->bcta", r, wx,
                         preferred_element_type=jnp.float32, precision=prec)
        return carry + jnp.sum(out * mask_i[None, :, :, None], axis=2), None

    init = jnp.zeros((b, c, a), jnp.float32)
    inputs = (
        corr_p.transpose(2, 0, 1, 3, 4, 5),
        px.transpose(2, 0, 1, 3, 4),
        py.transpose(2, 0, 1, 3, 4),
        mask_c.transpose(1, 0, 2),
    )
    out, _ = jax.lax.scan(body, init, inputs)
    return out


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    corr, grids, mask, dims = make_inputs(c=c)
    b, cc, h, w, t, th, tw = dims
    corr_t, px, py = prepare(corr, grids, dims)
    mask_t = mask.transpose(0, 2, 1).reshape(cc, t)

    variants = {
        "baseline_4d": v_baseline,
        "reshaped_2d": v_2d,
        "packed_1gather": v_packed,
        "matmul_hat": v_matmul,
    }
    ref = None
    for name, fn in variants.items():
        f = jax.jit(lambda ct, x, y, m: fn(ct, x, y, m, h, w))
        try:
            out = f(corr_t, px, py, mask_t)
            if ref is None:
                ref = np.asarray(out)
            else:
                err = np.abs(np.asarray(out) - ref).max()
                print(f"{name}: max err vs baseline {err:.2e}")
            dt = timeit(f, corr_t, px, py, mask_t)
            print(f"{name}: {dt * 1000:8.2f} ms")
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:200]}")

    # pallas variant (WARNING: tpu.dynamic_gather wedges this environment's
    # remote-compile toolchain; only run when explicitly requested)
    if not os.environ.get("RUN_PALLAS_VARIANT"):
        print("pallas: skipped (set RUN_PALLAS_VARIANT=1 to try)")
        return
    try:
        from os2d_tpu.ops.pallas_resample import resample_correlation_map_pallas

        f = jax.jit(lambda co, g, m: resample_correlation_map_pallas(co, g, m))
        out = f(corr, grids, mask)
        err = np.abs(np.asarray(out).reshape(ref.shape) - ref).max()
        dt = timeit(f, corr, grids, mask)
        print(f"pallas: {dt * 1000:8.2f} ms, err {err:.2e}")
    except Exception as e:
        print(f"pallas: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    main()

"""Host->device image wire formats.

The host->device image upload is the end-to-end bottleneck of both the eval
loop (~7.4 MB per B=2 dispatch at the 1280px protocol vs ~190 ms compute)
and the train loop (~4.3 MB/step batch images) on bandwidth-thin links
(BENCH_NOTES.md: the axon tunnel sustains ~20-37 MB/s). The reference ships
full fp32 RGB tensors to the GPU (os2d/engine/evaluate.py:306-342 moves
`batch_images` whole); round 2 already cut that 4x by shipping uint8 and
normalizing on device. This module adds the next 2x: a planar YUV 4:2:0
wire format (JPEG/JFIF BT.601 full-range), 1.5 bytes/pixel instead of 3.

Rationale: the datasets' source images are JPEGs, which are chroma-
subsampled 4:2:0 at rest — PIL's decoder *upsamples* the stored chroma to
RGB. Re-subsampling for the wire mostly re-drops information the source
never had. The transform is still lossy relative to the decoded RGB
(device-side nearest chroma upsampling vs libjpeg's fancy upsampling, and
the subsample box filter), so it is config-gated (cfg.tpu.upload_pixel
_format: "auto" = yuv420 on accelerator backends / bit-exact rgb8 on CPU;
pin "rgb8" for exact reference reproduction) and mAP-gated at the full
eval protocol (tests/test_pixel_format.py golden row). The r4 interleaved
A/B measured 10.55 img/s in both yuv420 legs vs 7.94/3.12 rgb8
(BENCH_NOTES r4) — end-to-end meets the compute-only ceiling.

Encode runs on host in numpy (one pass over the batch, ~5 ms/MB); decode
runs inside the jitted device program as pure elementwise VPU work that XLA
fuses into the existing uint8->normalized-float preamble.
"""

import numpy as np

# JPEG/JFIF BT.601 full-range matrices
_KR, _KG, _KB = 0.299, 0.587, 0.114


class PackedYuv420:
    """A batch of images as ONE flat uint8 wire buffer.

    Layout: [B*H*W] Y plane samples, then [B*(H//2)*(W//2)*2] interleaved
    Cb/Cr at quarter resolution. `data` may be a host numpy array (before
    upload) or a device array (after); `shape` is the logical RGB batch
    shape (B, H, W, 3) — H and W must be even. A single flat buffer keeps
    the upload ONE logical transfer (concurrent in-flight transfers contend
    catastrophically on thin links, BENCH_NOTES r3; utils/upload.py chunks
    one flat view in parallel streams instead).
    """

    __slots__ = ("data", "shape")

    def __init__(self, data, shape):
        b, h, w, c = shape
        assert c == 3 and h % 2 == 0 and w % 2 == 0, shape
        if isinstance(data, np.ndarray):  # tracers/device arrays skip checks
            # ndim 2 = a [K, n] stack of wires (stack_prepared_batches /
            # NaN-reproducer round trips); lax.scan slices it back to [n]
            assert data.dtype == np.uint8 and data.ndim in (1, 2), (
                data.dtype, data.shape)
            assert data.shape[-1] == b * h * w * 3 // 2, (data.shape, shape)
        self.data = data
        self.shape = tuple(shape)

    @property
    def nbytes(self):
        return self.data.nbytes


def _register_pytree():
    """PackedYuv420 passes through jax.jit as a one-leaf pytree; the logical
    RGB shape rides in the (hashable) aux data, so program caching keys on
    it exactly like an array shape."""
    import jax

    jax.tree_util.register_pytree_node(
        PackedYuv420,
        lambda p: ((p.data,), p.shape),
        lambda shape, children: PackedYuv420(children[0], shape),
    )


_register_pytree()


def rgb_to_yuv420(images_u8: np.ndarray) -> PackedYuv420:
    """uint8 RGB [B, H, W, 3] (H, W even) -> PackedYuv420.

    Y = 0.299 R + 0.587 G + 0.114 B; Cb/Cr offset-128, box-filtered 2x2 to
    quarter resolution (the standard JPEG encoder layout).
    """
    assert images_u8.dtype == np.uint8 and images_u8.ndim == 4, (
        images_u8.dtype, images_u8.shape)
    b, h, w, _ = images_u8.shape
    assert h % 2 == 0 and w % 2 == 0, images_u8.shape
    f = images_u8.astype(np.float32)
    r, g, bl = f[..., 0], f[..., 1], f[..., 2]
    y = _KR * r + _KG * g + _KB * bl
    cb = (bl - y) * (0.5 / (1.0 - _KB)) + 128.0
    cr = (r - y) * (0.5 / (1.0 - _KR)) + 128.0
    # 2x2 box filter then round: one mean over the block axes
    cb = cb.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    cr = cr.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    out = np.empty(b * h * w * 3 // 2, np.uint8)
    n_y = b * h * w
    np.clip(np.rint(y), 0, 255, out=y)
    out[:n_y] = y.astype(np.uint8).reshape(-1)
    uv = np.stack([cb, cr], axis=-1)
    np.clip(np.rint(uv), 0, 255, out=uv)
    out[n_y:] = uv.astype(np.uint8).reshape(-1)
    return PackedYuv420(out, images_u8.shape)


def yuv420_to_rgb_f32(flat_u8, shape):
    """Device-side decode: flat wire buffer -> float32 RGB 0..255 [B,H,W,3].

    Chroma upsampling is nearest (2x2 replicate) — pure reshape/broadcast
    work that XLA fuses into the downstream normalize; the quality delta vs
    bilinear is below the mAP gate (tests/test_pixel_format.py). Runs under
    jit; `shape` is static.
    """
    import jax.numpy as jnp

    b, h, w, _ = shape
    n_y = b * h * w
    y = flat_u8[:n_y].reshape(b, h, w).astype(jnp.float32)
    uv = flat_u8[n_y:].reshape(b, h // 2, w // 2, 2).astype(jnp.float32)
    uv = uv - 128.0
    # nearest 2x upsample via broadcast (fuses; no gather)
    uv = jnp.broadcast_to(uv[:, :, None, :, None, :],
                          (b, h // 2, 2, w // 2, 2, 2)).reshape(b, h, w, 2)
    cb, cr = uv[..., 0], uv[..., 1]
    r = y + (2.0 * (1.0 - _KR)) * cr
    bl = y + (2.0 * (1.0 - _KB)) * cb
    g = (y - _KR * r - _KB * bl) / _KG
    return jnp.clip(jnp.stack([r, g, bl], axis=-1), 0.0, 255.0)


def decode_wire_to_u8_device(packed: "PackedYuv420"):
    """Uploaded yuv420 wire buffer -> device-resident uint8 RGB [B,H,W,3].

    Used where the wire must become a plain array BEFORE the main program:
    mesh paths (parallel/mesh.py shards prepared arrays with explicit
    per-leaf specs), visualization, and tests. The single-chip train/eval
    steps instead decode the packed wire inside the program preamble
    (loss_fn._norm / decode_to_float_rgb) — design argument: an eager
    decode dispatch enqueued from the prefetcher thread rides the in-order
    TPU queue ahead of the previous group's compute while depending on a
    still-in-flight transfer, stalling compute behind the next group's
    uploads. Measured (BENCH_NOTES r5 train-wire matrix): the eager form
    lost both adjacent K=8 pairs vs packed (3.06 vs 3.56, 4.79 vs 6.18
    steps/s); tools/bench_train.py OS2D_UPLOAD_PIXEL_FORMAT=yuv420_eager
    reproduces it.
    The extra u8 rounding vs the direct-to-float decode is one half-LSB
    and is covered by the train-loss gate in tests/test_pixel_format.py."""
    import jax

    global _decode_u8_jit
    if _decode_u8_jit is None:
        def _decode(flat, shape):
            import jax.numpy as jnp

            rgb = yuv420_to_rgb_f32(flat, shape)
            return jnp.round(rgb).astype(jnp.uint8)

        _decode_u8_jit = jax.jit(_decode, static_argnums=1)
    return _decode_u8_jit(packed.data, packed.shape)


_decode_u8_jit = None


def decode_to_float_rgb(images, shape=None):
    """Uniform program preamble: uint8 RGB array OR PackedYuv420(.data on
    device) -> float32 RGB 0..255. Branches statically on the host type, so
    the compiled program bakes exactly one path."""
    import jax.numpy as jnp

    if isinstance(images, PackedYuv420):
        return yuv420_to_rgb_f32(images.data, images.shape)
    if shape is not None:  # raw flat device buffer + static shape
        return yuv420_to_rgb_f32(images, shape)
    return images.astype(jnp.float32)

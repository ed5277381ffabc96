"""YUV 4:2:0 upload wire format (ops/pixel_format.py).

The host->device image payload is the measured end-to-end bottleneck of the
eval loop (BENCH_NOTES r3/r4: ~7.4 MB per B=2 dispatch vs ~190 ms compute on
a ~20-37 MB/s tunnel); yuv420 halves it. The format is lossy in chroma, so
besides codec unit tests this module gates it END TO END: the planted-patch
eval protocol must produce the same detections through the yuv420 wire as
through bit-exact rgb8. Reference being exceeded: the reference ships full
fp32 RGB tensors per batch (os2d/engine/evaluate.py:306-342).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from os2d_tpu.ops.pixel_format import (
    PackedYuv420,
    decode_to_float_rgb,
    rgb_to_yuv420,
    yuv420_to_rgb_f32,
)


def _host_decode(packed: PackedYuv420) -> np.ndarray:
    """Independent numpy decode mirroring the device formulas."""
    b, h, w, _ = packed.shape
    n_y = b * h * w
    flat = np.asarray(packed.data)
    y = flat[:n_y].reshape(b, h, w).astype(np.float32)
    uv = flat[n_y:].reshape(b, h // 2, w // 2, 2).astype(np.float32) - 128.0
    uv = uv.repeat(2, axis=1).repeat(2, axis=2)
    cb, cr = uv[..., 0], uv[..., 1]
    r = y + 2.0 * (1.0 - 0.299) * cr
    bl = y + 2.0 * (1.0 - 0.114) * cb
    g = (y - 0.299 * r - 0.114 * bl) / 0.587
    return np.clip(np.stack([r, g, bl], axis=-1), 0.0, 255.0)


def test_wire_ratio_and_layout():
    img = np.random.RandomState(0).randint(0, 256, (2, 96, 128, 3), np.uint8)
    packed = rgb_to_yuv420(img)
    assert packed.data.dtype == np.uint8 and packed.data.ndim == 1
    assert packed.nbytes * 2 == img.nbytes  # 1.5 B/px vs 3 B/px
    assert packed.shape == img.shape


def test_gray_images_roundtrip_exact():
    """R=G=B => Y carries everything, chroma is exactly 128: lossless."""
    rng = np.random.RandomState(1)
    gray = rng.randint(0, 256, (1, 64, 64, 1), np.uint8).repeat(3, axis=-1)
    packed = rgb_to_yuv420(gray)
    out = np.asarray(yuv420_to_rgb_f32(jnp.asarray(packed.data), packed.shape))
    np.testing.assert_allclose(out, gray.astype(np.float32), atol=1e-3)


def test_chroma_flat_blocks_roundtrip_tight():
    """2x2-constant chroma (the 4:2:0 sampling grid) loses only rounding."""
    rng = np.random.RandomState(2)
    small = rng.randint(0, 256, (1, 32, 32, 3), np.uint8)
    img = np.kron(small, np.ones((1, 2, 2, 1))).astype(np.uint8)  # 64x64
    packed = rgb_to_yuv420(img)
    out = np.asarray(yuv420_to_rgb_f32(jnp.asarray(packed.data), packed.shape))
    # Y is per-pixel; chroma quantization costs at most ~2 levels through
    # the inverse matrix (|dRGB| <= 1.772 * 0.5 Y-rounding + chroma rounding)
    assert np.abs(out - img.astype(np.float32)).max() <= 2.5


def test_device_decode_matches_host_reference():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (2, 48, 64, 3), np.uint8)
    packed = rgb_to_yuv420(img)
    dev = np.asarray(
        jax.jit(yuv420_to_rgb_f32, static_argnums=1)(
            jnp.asarray(packed.data), packed.shape))
    host = _host_decode(packed)
    np.testing.assert_allclose(dev, host, atol=1e-3)


def test_packed_pytree_passes_through_jit():
    """PackedYuv420 is a one-leaf pytree: jit traces it, the logical RGB
    shape rides in aux data (so program caches key on it like a shape)."""
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (1, 16, 16, 3), np.uint8)
    packed = rgb_to_yuv420(img)
    traces = []

    @jax.jit
    def f(p):
        traces.append(None)
        return decode_to_float_rgb(p).mean()

    v1 = f(PackedYuv420(jnp.asarray(packed.data), packed.shape))
    v2 = f(PackedYuv420(jnp.asarray(packed.data), packed.shape))
    assert np.allclose(v1, v2) and len(traces) == 1
    # decode_to_float_rgb on a plain uint8 array is the rgb8 passthrough
    plain = decode_to_float_rgb(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(plain), img.astype(np.float32))


def test_odd_shapes_rejected():
    with pytest.raises(AssertionError):
        PackedYuv420(np.zeros(10, np.uint8), (1, 15, 16, 3))
    with pytest.raises(AssertionError):
        rgb_to_yuv420(np.zeros((1, 16, 15, 3), np.uint8))


# --- end-to-end gate: same detections through the lossy wire ------------


def _run_eval(loader, pixel_format, prescreen=False):
    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.engine.evaluate import evaluate
    from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params

    cfg = get_default_cfg()
    cfg.eval.mAP_iou_thresholds = [0.5]
    cfg.tpu.eval_class_chunk = 4
    cfg.tpu.eval_pre_top_k = 512
    cfg.tpu.eval_top_k = 64
    cfg.tpu.upload_pixel_format = pixel_format
    if prescreen:
        cfg.eval.nms_score_threshold = 0.4

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    return evaluate(loader, model, params, cfg)


@pytest.fixture(scope="module")
def synthetic_loader(tmp_path_factory):
    from test_end_to_end_eval import IMG_W, make_synthetic_dataset
    from os2d_tpu.data.dataset import DatasetOneShotDetection
    from os2d_tpu.data.dataloader import DataloaderOneShotDetection
    import os as _os

    root = str(tmp_path_factory.mktemp("synth_pix"))
    df = make_synthetic_dataset(root)
    dataset = DatasetOneShotDetection(
        df,
        gt_path=_os.path.join(root, "classes", "images"),
        image_path=_os.path.join(root, "src"),
        name="synth-pix",
        image_size=IMG_W,
        eval_scale=IMG_W,
        cache_images=True,
    )
    return DataloaderOneShotDetection(
        dataset=dataset, batch_size=1, pyramid_scales_eval=[1.0],
        do_augmentation=False,
    )


@pytest.mark.slow
def test_eval_yuv420_matches_rgb8(synthetic_loader):
    """The full eval loop through the yuv420 wire finds the same planted
    patches at the same quality as the bit-exact rgb8 wire."""
    res_rgb = _run_eval(synthetic_loader, "rgb8")
    res_yuv = _run_eval(synthetic_loader, "yuv420")
    assert res_rgb["mAP@0.50"] > 0.9, res_rgb
    assert res_yuv["mAP@0.50"] > 0.9, res_yuv
    assert abs(res_rgb["mAP@0.50"] - res_yuv["mAP@0.50"]) < 0.01


@pytest.mark.slow
def test_eval_yuv420_prescreen_path(synthetic_loader):
    """The two-phase prescreen program consumes the packed wire too."""
    res = _run_eval(synthetic_loader, "yuv420", prescreen=True)
    assert res["mAP@0.50"] > 0.9, res


# --- train path: packed wire decoded to uint8 right after upload --------


def _train_batch(tmp_path_factory):
    """One real train batch via the class-cache test's synthetic pipeline."""
    import random as _random

    from test_class_cache import _loaders_with_identical_rng

    tmp = str(tmp_path_factory.mktemp("synth_train_pix"))
    host_loader, _, cfg = _loaders_with_identical_rng(tmp, flips=False)
    _random.seed(11)
    return host_loader.get_batch(0), cfg


def test_train_prepare_yuv420_matches_rgb8(tmp_path_factory):
    """prepare_batch_arrays through the yuv420 wire yields a uint8 image
    batch whose luma is preserved to rounding and whose chroma error is
    bounded by the 4:2:0 subsample."""
    from os2d_tpu.engine.train import prepare_batch_arrays
    from os2d_tpu.ops.pixel_format import decode_wire_to_u8_device

    batch, _ = _train_batch(tmp_path_factory)
    a_rgb, c_rgb = prepare_batch_arrays(batch, pixel_format="rgb8")
    a_yuv, c_yuv = prepare_batch_arrays(batch, pixel_format="yuv420")
    assert c_rgb == c_yuv
    img_r = np.asarray(a_rgb["images"])
    # the wire stays packed until the step program decodes it (the eager
    # decode dispatch stalled the in-order device queue, BENCH_NOTES r4);
    # decode it here the same way the mesh path does
    assert isinstance(a_yuv["images"], PackedYuv420)
    assert a_yuv["images"].shape == img_r.shape
    img_y = np.asarray(decode_wire_to_u8_device(a_yuv["images"]))
    assert img_y.dtype == np.uint8 and img_y.shape == img_r.shape
    luma_r = img_r.astype(np.float32) @ np.array([0.299, 0.587, 0.114])
    luma_y = img_y.astype(np.float32) @ np.array([0.299, 0.587, 0.114])
    luma_err = np.abs(luma_r - luma_y)
    # Y is carried exactly up to quantization except where the RGB decode
    # clips at 0/255 (saturated pixels under sharp chroma edges)
    assert np.percentile(luma_err, 99) <= 3.0
    assert luma_err.mean() <= 1.0
    # random 8x8-block textures are a chroma-noise worst case (natural
    # images have far smoother chroma); the behavioral gate is the loss
    # test below plus the eval-detection gates above
    assert np.abs(img_r.astype(np.int16) - img_y.astype(np.int16)).mean() < 12.0
    # every other array is untouched by the wire format
    for k in ("class_images", "gt_boxes", "gt_labels", "gt_valid"):
        np.testing.assert_array_equal(np.asarray(a_rgb[k]), np.asarray(a_yuv[k]))


def test_train_k_step_scan_yuv420(tmp_path_factory):
    """K-step dispatch groups thread the PACKED wire through lax.scan
    (stack_prepared_batches stacks the flat buffers to [K, n]; the scan body
    decodes in its preamble). Per-step losses match the rgb8-wire group to
    the wire tolerance, and the packed group survives a NaN-reproducer
    numpy round trip."""
    import jax as _jax

    from os2d_tpu.engine.objective import ObjectiveConfig
    from os2d_tpu.engine.optimization import create_optimizer
    from os2d_tpu.engine.train import (
        TrainStep, build_trainable_mask, prepare_batch_arrays,
        stack_prepared_batches, train_k_batches)
    from os2d_tpu.models import Os2dConfig, init_os2d_params
    from os2d_tpu.utils.logger import setup_logger

    batch, cfg = _train_batch(tmp_path_factory)
    model_cfg = Os2dConfig(class_image_size=128)
    params = init_os2d_params(_jax.random.PRNGKey(1), model_cfg)
    mask = build_trainable_mask(params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)
    step = TrainStep(model_cfg, ObjectiveConfig(), optimizer, cfg.train)
    logger = setup_logger("OS2D.test")

    losses = {}
    for fmt in ("rgb8", "yuv420"):
        prepared = [prepare_batch_arrays(batch, pixel_format=fmt)
                    for _ in range(2)]
        _, _, fin = train_k_batches(
            prepared, params, optimizer.init(params), step, logger)
        losses[fmt] = [m["loss"] for m in fin()]
    assert losses["rgb8"] == pytest.approx(losses["yuv420"], rel=2e-2), losses

    # the stacked packed batch round-trips through the reproducer's
    # tree_map(np.asarray) without tripping the wire-shape asserts
    prepared = [prepare_batch_arrays(batch, pixel_format="yuv420")
                for _ in range(2)]
    stacked, _ = stack_prepared_batches(prepared)
    as_np = _jax.tree_util.tree_map(np.asarray, stacked)
    wire = as_np["images"]
    assert isinstance(wire, PackedYuv420) and wire.data.ndim == 2
    assert wire.data.shape[0] == 2


def test_train_loss_gate_yuv420(tmp_path_factory):
    """The train step's loss through the yuv420 wire matches the bit-exact
    rgb8 wire to well under the step-to-step loss scale (VERDICT r3 #2's
    upload-bound loop: the wire halves the dominant per-step payload)."""
    import jax as _jax

    from os2d_tpu.engine.objective import ObjectiveConfig
    from os2d_tpu.engine.optimization import create_optimizer
    from os2d_tpu.engine.train import (
        TrainStep, build_trainable_mask, prepare_batch_arrays, train_one_batch)
    from os2d_tpu.models import Os2dConfig, init_os2d_params
    from os2d_tpu.utils.logger import setup_logger

    batch, cfg = _train_batch(tmp_path_factory)
    model_cfg = Os2dConfig(class_image_size=128)
    params = init_os2d_params(_jax.random.PRNGKey(1), model_cfg)
    mask = build_trainable_mask(params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)
    step = TrainStep(model_cfg, ObjectiveConfig(), optimizer, cfg.train)
    logger = setup_logger("OS2D.test")

    losses = {}
    for fmt in ("rgb8", "yuv420"):
        prepared = prepare_batch_arrays(batch, pixel_format=fmt)
        _, _, meters = train_one_batch(
            batch, params, optimizer.init(params), step, logger,
            prepared=prepared)
        losses[fmt] = float(meters["loss"])
    assert losses["rgb8"] == pytest.approx(losses["yuv420"], rel=2e-2), losses

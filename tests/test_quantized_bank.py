"""int8 class-feature bank: quantization error bounds and eval parity."""

import numpy as np
import jax
import jax.numpy as jnp

from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
from os2d_tpu.models.head import (
    build_class_head,
    dequantize_class_head,
    head_forward,
    quantize_class_head,
)
from os2d_tpu.models.resnet import resnet_c4_forward


def test_quantize_roundtrip_error():
    rng = np.random.RandomState(0)
    feats = rng.randn(5, 15, 15, 64).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)  # as build_class_head
    head = build_class_head(jnp.asarray(feats))
    q = quantize_class_head(head)
    assert q.class_feats_q.dtype == jnp.int8
    assert q.scales.shape == (5,)
    back = np.asarray(dequantize_class_head(q).class_feats)
    ref = np.asarray(head.class_feats)
    # absmax/127 quantization step bounds the per-element error
    step = np.abs(ref).max(axis=(1, 2, 3), keepdims=True) / 127.0
    assert (np.abs(back - ref) <= step * 0.5 + 1e-7).all()


def test_quantized_head_scores_close():
    """cls scores through the full head with an int8 bank track fp32."""
    rng = np.random.RandomState(1)
    cfg = Os2dConfig()
    params = init_os2d_params(jax.random.PRNGKey(1), cfg)
    images = jnp.asarray(rng.randn(1, 128, 160, 3).astype(np.float32))
    class_images = jnp.asarray(rng.randn(2, 96, 96, 3).astype(np.float32))

    fm = resnet_c4_forward(params["backbone"], images)
    head = build_class_head(resnet_c4_forward(params["backbone"], class_images))
    ref = head_forward(params["transform_net"], fm, head)
    deq = dequantize_class_head(quantize_class_head(head))
    out = head_forward(params["transform_net"], fm, deq)

    cls_ref = np.asarray(ref["cls"])
    cls_q = np.asarray(out["cls"])
    # scores live in [-1, 1]; int8 feature noise stays well under 1e-2
    assert np.abs(cls_q - cls_ref).max() < 0.01, np.abs(cls_q - cls_ref).max()
    assert (cls_q.argmax(-1) == cls_ref.argmax(-1)).all()


def test_eval_with_quantized_bank(tmp_path):
    """cfg.tpu.quantize_class_feats routes through the chunked path and still
    finds the planted patches."""
    from test_end_to_end_eval import make_synthetic_dataset, IMG_W
    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataset import DatasetOneShotDetection
    from os2d_tpu.data.dataloader import DataloaderOneShotDetection
    from os2d_tpu.engine.evaluate import evaluate
    import os

    root = str(tmp_path)
    df = make_synthetic_dataset(root)
    dataset = DatasetOneShotDetection(
        df, gt_path=os.path.join(root, "classes", "images"),
        image_path=os.path.join(root, "src"), name="synth-q",
        image_size=IMG_W, eval_scale=IMG_W, cache_images=True,
    )
    loader = DataloaderOneShotDetection(
        dataset=dataset, batch_size=1, pyramid_scales_eval=[1.0],
        do_augmentation=False,
    )
    cfg = get_default_cfg()
    cfg.eval.mAP_iou_thresholds = [0.5]
    cfg.tpu.eval_class_chunk = 4
    cfg.tpu.eval_pre_top_k = 512
    cfg.tpu.eval_top_k = 64
    cfg.tpu.quantize_class_feats = True

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    results = evaluate(loader, model, params, cfg)
    assert results["mAP@0.50"] > 0.9, results

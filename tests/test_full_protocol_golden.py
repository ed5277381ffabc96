"""FULL-PROTOCOL parity pack (VERDICT r1 item 6): the complete headline eval
protocol — 7-scale pyramid [0.5..1.6] + rotation90 class TTA + VOC mAP — run
through BOTH stacks end to end on shared weights:

  reference: os2d.engine.evaluate.evaluate (executed, injected torch backbone)
  ours:      os2d_tpu.engine.evaluate.evaluate (fused single-dispatch path)

Asserted:
  * mAP@0.50 equality with OUR DEFAULT deviations active (class-shape
    palette, eval_pre_top_k=1024 cap) — this validates those deviations at
    protocol scale instead of leaving them "unvalidated" (VERDICT r1 §3);
  * detection-level parity (boxes + scores) in exact-parity mode
    (exact class resize, uncapped pre-top-k, 'highest' resample precision).

Scale: the pyramid BASE defaults to 640x480 so the suite stays runnable on
CPU; set OS2D_FULLSCALE=1 for the reference's literal 1280x960 protocol
(os2d/README.md:84-88) — same code path, larger shapes.
"""

import os
import pickle

import numpy as np
import pandas as pd
import pytest
import torch
from PIL import Image

from reference_oracle import import_reference

import_reference()

from test_full_model_golden import build_reference_model  # noqa: E402

FULLSCALE = bool(os.environ.get("OS2D_FULLSCALE"))
IMG_W, IMG_H = (1280, 960) if FULLSCALE else (640, 480)
PATCH = 240 if FULLSCALE else 160
SCALES = [0.5, 0.625, 0.8, 1.0, 1.2, 1.4, 1.6]  # os2d/config.py:194
NUM_CLASSES = 3
NUM_IMAGES = 2
IMG_NORM = {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}

# The paper's OTHER eval configs (VERDICT r3 item 6), each a full
# two-stack protocol run. CPU default uses a 3-scale pyramid + reduced
# eval scale to bound suite time; OS2D_FULLSCALE=1 runs the literal paper
# settings. Reference configs: experiments/launcher_grozi_eval.py:93-109
# (paste-f: dataset_scales=[2000], rotation90) and README.md:63-113
# (V1 = resnet101 + simplified affine; horflip_rotation90 TTA).
SCALES_VARIANT = SCALES if FULLSCALE else [0.625, 1.0, 1.4]
VARIANTS = {
    "v1_rot90": dict(arch="resnet101", simplify=True, tta="rotation90",
                     eval_scale=None),
    "v2_horflip_rot90": dict(arch="resnet50", simplify=False,
                             tta="horflip_rotation90", eval_scale=None),
    "v2_pastef_2000": dict(arch="resnet50", simplify=False, tta="rotation90",
                           eval_scale=2000 if FULLSCALE else 896),
    "v2_int8_bank": dict(arch="resnet50", simplify=False, tta="rotation90",
                         eval_scale=None, quantize=True),
}


def write_dataset(root):
    """Planted textured patches with scale jitter + blend noise (scores must
    spread below saturation for mAP differences to be observable)."""
    rng = np.random.RandomState(7)
    os.makedirs(os.path.join(root, "classes", "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "src"), exist_ok=True)
    patches = {}
    for cid in range(NUM_CLASSES):
        p = rng.randint(0, 255, (PATCH // 8, PATCH // 8, 3), np.uint8)
        patches[cid] = np.kron(p, np.ones((8, 8, 1), np.uint8))
        Image.fromarray(patches[cid]).save(
            os.path.join(root, "classes", "images", f"c{cid}.jpg"), quality=95
        )
    rows = []
    plant_specs = [  # (image, class, scale, difficult)
        [(0, 1.0, 0), (1, 0.9, 0)],
        [(2, 1.15, 0), (0, 0.85, 1), (1, 1.05, 0)],
    ]
    for image_id, plants in enumerate(plant_specs):
        img = rng.randint(0, 90, (IMG_H, IMG_W, 3), np.uint8)
        for (cid, scale, difficult) in plants:
            size = int(PATCH * scale)
            x0 = int(rng.randint(0, IMG_W - size))
            y0 = int(rng.randint(0, IMG_H - size))
            patch = np.asarray(
                Image.fromarray(patches[cid]).resize((size, size), Image.BILINEAR)
            )
            noise = rng.randint(-25, 25, patch.shape).astype(np.int16)
            img[y0: y0 + size, x0: x0 + size] = np.clip(
                patch.astype(np.int16) + noise, 0, 255
            ).astype(np.uint8)
            rows.append(
                dict(imageid=image_id, imagefilename=f"img{image_id}.jpg",
                     classid=cid, classfilename=f"c{cid}.jpg",
                     gtbboxid=len(rows), difficult=difficult,
                     lx=x0 / IMG_W, ty=y0 / IMG_H,
                     rx=(x0 + size) / IMG_W, by=(y0 + size) / IMG_H)
            )
        Image.fromarray(img).save(
            os.path.join(root, "src", f"img{image_id}.jpg"), quality=95
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def protocol_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("protocol"))
    df = write_dataset(root)
    ref_model = build_reference_model()
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    return root, df, ref_model, sd


@pytest.fixture(scope="module")
def reference_run(protocol_setup, tmp_path_factory):
    """Run the reference's FULL evaluate() once; return (losses, detections)."""
    root, df, ref_model, _ = protocol_setup
    out_dir = str(tmp_path_factory.mktemp("ref_dets"))
    return _run_reference(root, df, ref_model, out_dir)


def _run_reference(root, df, ref_model, out_dir, tta="rotation90",
                   eval_scale=None, pyramid=None):

    from os2d.config import cfg as ref_cfg_global
    from os2d.data.dataset import DatasetOneShotDetection as RefDataset
    from os2d.data.dataloader import DataloaderOneShotDetection as RefLoader
    from os2d.engine.evaluate import evaluate as ref_evaluate
    from os2d.modeling.box_coder import Os2dBoxCoder, BoxGridGenerator
    from os2d.structures.feature_map import FeatureMapSize as RefFMS

    from os2d_tpu.structures.feature_map import (
        FeatureMapSize,
        feature_map_size_for_image,
    )

    def get_fm_size(img_size):
        fm = feature_map_size_for_image(FeatureMapSize(w=img_size.w, h=img_size.h))
        return RefFMS(w=fm.w, h=fm.h)

    coder = Os2dBoxCoder(
        positive_iou_threshold=0.5, negative_iou_threshold=0.1,
        remap_classification_targets_iou_pos=0.8,
        remap_classification_targets_iou_neg=0.4,
        output_box_grid_generator=BoxGridGenerator(
            box_size=RefFMS(w=240, h=240), box_stride=RefFMS(w=16, h=16)
        ),
        function_get_feature_map_size=get_fm_size,
        do_nms_across_classes=False,
    )
    dataset = RefDataset(
        df, gt_path=os.path.join(root, "classes", "images"),
        image_path=os.path.join(root, "src"), name="protocol",
        image_size=IMG_W, eval_scale=eval_scale or IMG_W, cache_images=True,
    )
    loader = RefLoader(
        dataset=dataset, box_coder=coder, batch_size=1,
        img_normalization=IMG_NORM, gt_image_size=240,
        pyramid_scales_eval=pyramid or SCALES, do_augmentation=False,
    )
    cfg = ref_cfg_global.clone()
    cfg.is_cuda = False
    cfg.eval.batch_size = 1
    cfg.eval.class_image_augmentation = tta
    cfg.visualization.eval.path_to_save_detections = out_dir

    # the reference calls torch.cuda.synchronize() unconditionally in its
    # eval iterator (os2d/engine/evaluate.py:312); no-op it on CPU
    orig_sync = torch.cuda.synchronize
    torch.cuda.synchronize = lambda *a, **k: None
    try:
        with torch.no_grad():
            losses = ref_evaluate(loader, ref_model, cfg, criterion=None)
    finally:
        torch.cuda.synchronize = orig_sync

    data = torch.load(os.path.join(out_dir, "protocol_detections.pth"),
                      weights_only=False)
    return losses, data


def _run_ours(protocol_setup, tmp_path_factory, *, exact_parity: bool,
              sd=None, arch="resnet50", simplify=False, tta="rotation90",
              eval_scale=None, pyramid=None, quantize=False):
    root, df, _, sd_default = protocol_setup
    sd = sd if sd is not None else sd_default
    out_dir = str(tmp_path_factory.mktemp(
        "my_dets_exact" if exact_parity else "my_dets_default"))

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataset import DatasetOneShotDetection
    from os2d_tpu.data.dataloader import DataloaderOneShotDetection
    from os2d_tpu.engine.evaluate import evaluate
    from os2d_tpu.models import Os2dConfig, Os2dModel
    from os2d_tpu.models.os2d import import_os2d_torch_checkpoint

    dataset = DatasetOneShotDetection(
        df, gt_path=os.path.join(root, "classes", "images"),
        image_path=os.path.join(root, "src"), name="protocol",
        image_size=IMG_W, eval_scale=eval_scale or IMG_W, cache_images=True,
    )
    loader = DataloaderOneShotDetection(
        dataset=dataset, batch_size=1, pyramid_scales_eval=pyramid or SCALES,
        do_augmentation=False,
        class_shape_palette=None if exact_parity else "default",
    )
    cfg = get_default_cfg()
    cfg.eval.class_image_augmentation = tta
    cfg.visualization.eval.path_to_save_detections = out_dir
    model_cfg = Os2dConfig(
        resample_precision="highest" if exact_parity else "high",
        backbone_arch=arch, use_simplified_affine_model=simplify,
    )
    cfg.tpu.resample_precision = model_cfg.resample_precision
    if exact_parity:
        cfg.tpu.eval_pre_top_k = 200_000  # uncapped (reference keeps all)
    if quantize:
        cfg.tpu.quantize_class_feats = True
    params = import_os2d_torch_checkpoint(sd, model_cfg)
    model = Os2dModel(model_cfg)
    results = evaluate(loader, model, params, cfg)

    with open(os.path.join(out_dir, "protocol_detections.pkl"), "rb") as f:
        data = pickle.load(f)
    return results, data


@pytest.fixture(scope="module")
def ours_default_run(protocol_setup, tmp_path_factory):
    return _run_ours(protocol_setup, tmp_path_factory, exact_parity=False)


@pytest.fixture(scope="module")
def ours_exact_run(protocol_setup, tmp_path_factory):
    return _run_ours(protocol_setup, tmp_path_factory, exact_parity=True)


def test_map_parity_with_default_deviations(reference_run, ours_default_run):
    """OUR defaults (class-shape palette + pre_top_k=1024) must reproduce the
    reference's mAP at the full protocol — the VERDICT r1 gate for keeping
    those deviations on by default."""
    ref_losses, _ = reference_run
    my_results, _ = ours_default_run
    assert abs(my_results["mAP@0.50"] - ref_losses["mAP@0.50"]) <= 0.02, (
        my_results["mAP@0.50"], ref_losses["mAP@0.50"])
    assert abs(my_results["recall@0.50"] - ref_losses["recall@0.50"]) <= 0.05


def test_detection_parity_exact_mode(reference_run, ours_exact_run):
    """Exact-parity mode: decoded boxes and scores match the executed
    reference detection-for-detection (top of each class ranking)."""
    _, ref = reference_run
    _, mine = ours_exact_run

    ref_by_id = {int(i): k for k, i in enumerate(ref["image_ids"])}
    for k_my, image_id in enumerate(mine["image_ids"]):
        k_ref = ref_by_id[int(image_id)]
        rb = np.asarray(ref["boxes_xyxy"][k_ref])
        rs = np.asarray(ref["scores"][k_ref])
        rl = np.asarray(ref["labels"][k_ref])
        mb = np.asarray(mine["boxes_xyxy"][k_my])
        ms = np.asarray(mine["scores"][k_my])
        ml = np.asarray(mine["labels"][k_my])
        from os2d_tpu.data.voc_eval import _box_iou_np

        for label in np.unique(rl):
            r_idx = np.where(rl == label)[0]
            m_idx = np.where(ml == label)[0]
            order_r = r_idx[np.argsort(-rs[r_idx], kind="stable")][:10]
            order_m = m_idx[np.argsort(-ms[m_idx], kind="stable")][:10]
            n = min(len(order_r), len(order_m))
            assert n > 0
            # the ranked score LISTS must agree position-by-position ...
            np.testing.assert_allclose(
                ms[order_m[:n]], rs[order_r[:n]], rtol=2e-3, atol=2e-3,
                err_msg=f"image {image_id} label {label} scores",
            )
            # ... but near-tied detections may permute in rank or flip NMS
            # survivors (two overlapping candidates with scores ~1e-4 apart:
            # each stack may keep the other one), so boxes are matched by IoU
            # against our FULL per-class list, tie-aware:
            #   strong match: IoU > 0.7 and score within 5e-3
            #   tie-flip:     IoU > nms_iou (0.3) and score within 5e-3
            #                 (our survivor is the reference's suppressed twin)
            iou_all = _box_iou_np(rb[order_r[:n]], mb[m_idx])
            strong = 0
            for i_r in range(n):
                score_twin = np.abs(ms[m_idx] - rs[order_r[i_r]]) < 5e-3
                cand = np.where(score_twin, iou_all[i_r], -1.0)
                j = int(np.argmax(cand))
                assert cand[j] > 0.3, (
                    f"image {image_id} label {label}: reference detection "
                    f"{i_r} (score {rs[order_r[i_r]]:.4f}) has no score-twin "
                    f"with IoU>0.3 among ours (best {cand[j]:.3f})"
                )
                if cand[j] > 0.7:
                    strong += 1
            assert strong >= (n + 1) // 2, (
                f"image {image_id} label {label}: only {strong}/{n} strong "
                f"(IoU>0.7) matches — more than tie-flips can explain"
            )


def test_losses_present_under_tta(protocol_setup, tmp_path_factory):
    """Eval loss metrics must be computed even with class TTA active
    (VERDICT r1 weak item 6: the reference computes losses whenever
    requested; rotation90 must not silently drop them)."""
    root, df, _, sd = protocol_setup

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataset import DatasetOneShotDetection
    from os2d_tpu.data.dataloader import DataloaderOneShotDetection
    from os2d_tpu.engine.evaluate import evaluate
    from os2d_tpu.engine.objective import ObjectiveConfig
    from os2d_tpu.models import Os2dConfig, Os2dModel
    from os2d_tpu.models.os2d import import_os2d_torch_checkpoint

    dataset = DatasetOneShotDetection(
        df, gt_path=os.path.join(root, "classes", "images"),
        image_path=os.path.join(root, "src"), name="protocol",
        image_size=IMG_W, eval_scale=IMG_W, cache_images=True,
    )
    loader = DataloaderOneShotDetection(
        dataset=dataset, batch_size=1, pyramid_scales_eval=[1.0],
        do_augmentation=False,
    )
    cfg = get_default_cfg()
    cfg.eval.class_image_augmentation = "rotation90"
    model_cfg = Os2dConfig()
    params = import_os2d_torch_checkpoint(sd, model_cfg)
    model = Os2dModel(model_cfg)
    results = evaluate(loader, model, params, cfg,
                       criterion=ObjectiveConfig())
    loss_keys = [k for k in results if "loss" in k.lower()]
    assert loss_keys, results.keys()
    assert all(np.isfinite(results[k]) for k in loss_keys)


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_map_parity_paper_variants(variant, protocol_setup, tmp_path_factory):
    """mAP parity on the paper's OTHER eval configs (VERDICT r3 item 6):
    V1 model path (ResNet101 + simplified affine), horflip_rotation90 class
    TTA, the paste-f-style rotation90 eval at a rescaled dataset scale
    (launcher_grozi_eval.py:105-109: dataset_scales=[2000] + rotation90),
    and the int8-quantized class-feature bank at the full protocol.

    Each runs BOTH stacks end to end on shared weights; int8 compares ours
    (quantized) against the reference's float run with a wider gate."""
    v = VARIANTS[variant]
    root, df, _, _ = protocol_setup
    quantize = v.get("quantize", False)

    if v["arch"] == "resnet50" and not v["simplify"]:
        ref_model = protocol_setup[2]
        sd = protocol_setup[3]
    else:
        ref_model = build_reference_model(
            backbone_arch=v["arch"], simplify_affine=v["simplify"])
        sd = {k: t.numpy() for k, t in ref_model.state_dict().items()}

    ref_out = str(tmp_path_factory.mktemp(f"ref_{variant}"))
    ref_losses, _ = _run_reference(
        root, df, ref_model, ref_out, tta=v["tta"],
        eval_scale=v["eval_scale"], pyramid=SCALES_VARIANT)

    my_results, _ = _run_ours(
        protocol_setup, tmp_path_factory, exact_parity=False, sd=sd,
        arch=v["arch"], simplify=v["simplify"], tta=v["tta"],
        eval_scale=v["eval_scale"], pyramid=SCALES_VARIANT,
        quantize=quantize)

    gate = 0.05 if quantize else 0.02
    assert abs(my_results["mAP@0.50"] - ref_losses["mAP@0.50"]) <= gate, (
        variant, my_results["mAP@0.50"], ref_losses["mAP@0.50"])
    assert abs(my_results["recall@0.50"] - ref_losses["recall@0.50"]) <= 0.05, (
        variant, my_results["recall@0.50"], ref_losses["recall@0.50"])

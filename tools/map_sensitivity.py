"""mAP sensitivity harness for numeric-mode flips (resample precision, bf16,
BN folding, int8 class bank).

Real released checkpoints + datasets are unavailable in this environment, so
the harness builds a synthetic detection task, optionally TRAINS the model on
it for a few hundred steps on the actual device (so weights are post-descent,
not random init), then evaluates the SAME weights under each numeric config
and reports:

  - mAP@0.5 per config (the decision metric),
  - per-detection score deltas vs the fp32 'high' baseline on matched boxes,
  - box agreement (IoU of the top matched detections).

A flip is considered mAP-safe when mAP is unchanged and matched-score deltas
stay well below the detection score scale (~1.0). This is the gate VERDICT.md
asked for before flipping cfg.tpu.resample_precision='default'
(+7% eval throughput, BENCH_NOTES.md).

Run on the TPU:  python tools/map_sensitivity.py [--train-steps N] [--scales K]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
from PIL import Image


IMG_W, IMG_H = 960, 720
PATCH = 240
NUM_CLASSES = 8
NUM_IMAGES = 6


def make_dataset(root, rng, jitter=True):
    """Planted textured patches with scale jitter + noise so detection scores
    are NOT saturated at 1.0 (saturated scores make every precision look
    identical; jittered plants keep the ranking sensitive to score noise)."""
    import pandas as pd

    os.makedirs(os.path.join(root, "classes", "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "src"), exist_ok=True)
    patches = {}
    for cid in range(NUM_CLASSES):
        p = rng.randint(0, 255, (PATCH // 8, PATCH // 8, 3), np.uint8)
        patches[cid] = np.kron(p, np.ones((8, 8, 1), np.uint8))
        Image.fromarray(patches[cid]).save(
            os.path.join(root, "classes", "images", f"class{cid}.jpg"), quality=95
        )
    rows = []
    for image_id in range(NUM_IMAGES):
        img = rng.randint(0, 120, (IMG_H, IMG_W, 3), np.uint8)
        for k in range(3):
            cid = int(rng.randint(NUM_CLASSES))
            scale = rng.uniform(0.8, 1.25) if jitter else 1.0
            size = int(PATCH * scale)
            x0 = int(rng.randint(0, IMG_W - size))
            y0 = int(rng.randint(0, IMG_H - size))
            patch = np.asarray(
                Image.fromarray(patches[cid]).resize((size, size), Image.BILINEAR)
            )
            # blend into the scene so correlation is high but not exact
            noise = rng.randint(-20, 20, patch.shape).astype(np.int16)
            img[y0: y0 + size, x0: x0 + size] = np.clip(
                patch.astype(np.int16) + noise, 0, 255
            ).astype(np.uint8)
            rows.append(
                dict(imageid=image_id, imagefilename=f"img{image_id}.jpg",
                     classid=cid, classfilename=f"class{cid}.jpg",
                     gtbboxid=len(rows), difficult=0,
                     lx=x0 / IMG_W, ty=y0 / IMG_H,
                     rx=(x0 + size) / IMG_W, by=(y0 + size) / IMG_H,
                     split="train")
            )
        Image.fromarray(img).save(os.path.join(root, "src", f"img{image_id}.jpg"),
                                  quality=95)
    return pd.DataFrame(rows)


def match_detections(ref, cur):
    """Greedy per-class matching of current detections to reference ones.

    Returns (score deltas of matched pairs, IoUs of matched pairs, n_unmatched).
    """
    from os2d_tpu.data.voc_eval import _box_iou_np as bbox_iou_xyxy

    deltas, ious, unmatched = [], [], 0
    for (rb, rs, rl), (cb, cs, cl) in zip(ref, cur):
        for lab in np.unique(rl):
            r_idx = np.where(rl == lab)[0]
            c_idx = np.where(cl == lab)[0]
            if len(c_idx) == 0:
                unmatched += len(r_idx)
                continue
            iou = bbox_iou_xyxy(rb[r_idx], cb[c_idx])
            for i_r in np.argsort(-rs[r_idx]):
                j = int(np.argmax(iou[i_r]))
                if iou[i_r, j] > 0.5:
                    deltas.append(abs(rs[r_idx[i_r]] - cs[c_idx[j]]))
                    ious.append(iou[i_r, j])
                    iou[:, j] = -1
                else:
                    unmatched += 1
    return np.asarray(deltas), np.asarray(ious), unmatched


def gate_train_wire(args, dataset, logger):
    """Trained-mAP gate for the lossy yuv420 TRAIN wire (VERDICT r4 item 2).

    Two --train-steps runs from the SAME init and host-RNG seed — one with
    every batch prepared through the bit-exact rgb8 wire, one through the
    yuv420 wire (so every training gradient flows through chroma-subsampled
    images) — then both sets of trained weights evaluate under the IDENTICAL
    protocol (fp32/high, rgb8 eval wire), isolating the train-wire effect.
    Same standard the bf16 lever was gated at (BENCH_NOTES: dmAP -0.146
    killed bf16)."""
    import pickle
    import random
    import time

    import jax

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataloader import (
        DataloaderOneShotDetection,
        build_train_dataloader_from_config,
    )
    from os2d_tpu.engine.evaluate import evaluate
    from os2d_tpu.engine.objective import ObjectiveConfig
    from os2d_tpu.engine.optimization import create_optimizer
    from os2d_tpu.engine.train import (
        TrainStep, build_trainable_mask, prepare_batch_arrays,
        train_one_batch,
    )
    from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params

    model_cfg = Os2dConfig()

    def train_run(wire):
        # identical host RNG streams across the two runs: the loaders draw
        # the exact same augmented batches; only the wire format differs
        random.seed(7)
        np.random.seed(7)
        cfg = get_default_cfg()
        cfg.train.batch_size = 4
        cfg.train.class_batch_size = NUM_CLASSES
        cfg.train.augment.train_patch_width = 480
        cfg.train.augment.train_patch_height = 480
        cfg.train.optim.lr = 1e-4
        loader, _ = build_train_dataloader_from_config(
            cfg, dataset_train=dataset)
        params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
        mask = build_trainable_mask(params, cfg.train)
        optimizer = create_optimizer(cfg.train.optim, mask)
        opt_state = optimizer.init(params)
        step = TrainStep(model_cfg, ObjectiveConfig(), optimizer, cfg.train)
        t0 = time.time()
        for i in range(args.train_steps):
            batch = loader.get_batch(i % len(loader))
            prepared = prepare_batch_arrays(batch, pixel_format=wire)
            params, opt_state, meters = train_one_batch(
                batch, params, opt_state, step, logger, prepared=prepared)
            if i % 50 == 0:
                print(f"[{wire}] step {i}: loss={meters['loss']:.4f}",
                      flush=True)
        print(f"[{wire}] trained {args.train_steps} steps in "
              f"{time.time() - t0:.1f}s, final loss {meters['loss']:.4f}",
              flush=True)
        return jax.tree_util.tree_map(np.asarray, params)

    lo = max(0.6, 1.0 - 0.2 * (args.scales // 2))
    scales = list(np.linspace(lo, 2.0 - lo, args.scales))

    detections, results = {}, {}
    for wire in ("rgb8", "yuv420"):
        params = train_run(wire)
        cfg = get_default_cfg()
        cfg.eval.mAP_iou_thresholds = [0.5]
        cfg.tpu.eval_class_chunk = NUM_CLASSES
        cfg.tpu.resample_precision = "high"
        cfg.tpu.upload_pixel_format = "rgb8"  # identical bit-exact eval wire
        cfg.visualization.eval.path_to_save_detections = os.path.join(
            args.root, f"dets_trainwire_{wire}")
        eval_loader = DataloaderOneShotDetection(
            dataset=dataset, batch_size=1, pyramid_scales_eval=scales,
            do_augmentation=False,
        )
        model = Os2dModel(model_cfg)
        res = evaluate(eval_loader, model, params, cfg)
        results[wire] = res
        with open(os.path.join(args.root, f"dets_trainwire_{wire}",
                               "sens_detections.pkl"), "rb") as f:
            d = pickle.load(f)
        detections[wire] = list(zip(d["boxes_xyxy"], d["scores"], d["labels"]))
        print(f"train-wire {wire}: mAP@0.50={res['mAP@0.50']:.4f} "
              f"recall={res['recall@0.50']:.4f}", flush=True)

    dmap = results["yuv420"]["mAP@0.50"] - results["rgb8"]["mAP@0.50"]
    deltas, ious, unmatched = match_detections(
        detections["rgb8"], detections["yuv420"])
    print(
        f"\n=== train-wire gate (yuv420-trained vs rgb8-trained) ===\n"
        f"dmAP={dmap:+.4f} "
        f"score_delta mean={deltas.mean() if len(deltas) else 0:.2e} "
        f"max={deltas.max() if len(deltas) else 0:.2e} "
        f"match_iou_mean={ious.mean() if len(ious) else 0:.4f} "
        f"unmatched={unmatched}/"
        f"{sum(len(b[1]) for b in detections['rgb8'])}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=200)
    ap.add_argument("--scales", type=int, default=3,
                    help="pyramid levels around 1.0 for eval")
    ap.add_argument("--root", default="/tmp/map_sensitivity")
    ap.add_argument("--gate", choices=["numeric", "train-wire"],
                    default="numeric",
                    help="numeric: eval-time numeric-mode flips on shared "
                         "trained weights; train-wire: two full training "
                         "runs differing only in the upload wire format")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_os2d"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataset import DatasetOneShotDetection
    from os2d_tpu.data.dataloader import (
        DataloaderOneShotDetection,
        build_train_dataloader_from_config,
    )
    from os2d_tpu.engine.evaluate import evaluate
    from os2d_tpu.engine.objective import ObjectiveConfig
    from os2d_tpu.engine.optimization import create_optimizer
    from os2d_tpu.engine.train import (
        TrainStep, build_trainable_mask, train_one_batch,
    )
    from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
    from os2d_tpu.utils.logger import setup_logger

    logger = setup_logger("OS2D.sens", None)
    rng = np.random.RandomState(0)
    os.makedirs(args.root, exist_ok=True)
    df = make_dataset(args.root, rng)
    dataset = DatasetOneShotDetection(
        df, gt_path=os.path.join(args.root, "classes", "images"),
        image_path=os.path.join(args.root, "src"), name="sens",
        image_size=IMG_W, eval_scale=IMG_W, cache_images=True,
    )

    if args.gate == "train-wire":
        gate_train_wire(args, dataset, logger)
        return

    # ---- train a few hundred steps so weights are off random init ----
    model_cfg = Os2dConfig()
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    if args.train_steps > 0:
        cfg = get_default_cfg()
        cfg.train.batch_size = 4
        cfg.train.class_batch_size = NUM_CLASSES
        cfg.train.augment.train_patch_width = 480
        cfg.train.augment.train_patch_height = 480
        cfg.train.optim.lr = 1e-4
        loader, _ = build_train_dataloader_from_config(cfg, dataset_train=dataset)
        obj = ObjectiveConfig()
        mask = build_trainable_mask(params, cfg.train)
        optimizer = create_optimizer(cfg.train.optim, mask)
        opt_state = optimizer.init(params)
        step = TrainStep(model_cfg, obj, optimizer, cfg.train)
        import time

        t0 = time.time()
        for i in range(args.train_steps):
            batch = loader.get_batch(i % len(loader))
            params, opt_state, meters = train_one_batch(
                batch, params, opt_state, step, logger
            )
            if i % 50 == 0:
                print(f"train step {i}: loss={meters['loss']:.4f}", flush=True)
        print(f"trained {args.train_steps} steps in {time.time() - t0:.1f}s")
    params_np = jax.tree_util.tree_map(np.asarray, params)

    # ---- evaluate the same weights under each numeric config ----
    lo = max(0.6, 1.0 - 0.2 * (args.scales // 2))
    scales = list(np.linspace(lo, 2.0 - lo, args.scales))
    eval_loader = DataloaderOneShotDetection(
        dataset=dataset, batch_size=1, pyramid_scales_eval=scales,
        do_augmentation=False,
    )

    configs = {
        "fp32_high": dict(compute_dtype="float32", resample_precision="high"),
        "fp32_default": dict(compute_dtype="float32",
                             resample_precision="default"),
        "bf16_fold_default": dict(compute_dtype="bfloat16",
                                  resample_precision="default", fold_bn=True),
        "fp32_high_int8bank": dict(compute_dtype="float32",
                                   resample_precision="high", quantize=True),
        # NATURAL template channel order (corr_interior_first=True is the
        # default since r3, gated by this harness at dmAP +0.0000): keep the
        # no-perm A/B runnable so future numeric changes can re-gate it
        "fp32_default_noperm": dict(compute_dtype="float32",
                                    resample_precision="default",
                                    corr_interior_first=False),
    }

    detections = {}
    results = {}
    for name, nc in configs.items():
        cfg = get_default_cfg()
        cfg.eval.mAP_iou_thresholds = [0.5]
        cfg.tpu.eval_class_chunk = NUM_CLASSES
        cfg.tpu.compute_dtype = nc.get("compute_dtype", "float32")
        cfg.tpu.resample_precision = nc.get("resample_precision", "high")
        cfg.tpu.fold_bn = bool(nc.get("fold_bn", False))
        cfg.tpu.quantize_class_feats = bool(nc.get("quantize", False))
        cfg.visualization.eval.path_to_save_detections = os.path.join(
            args.root, f"dets_{name}"
        )
        m_cfg = Os2dConfig(
            compute_dtype=cfg.tpu.compute_dtype,
            resample_precision=cfg.tpu.resample_precision,
            corr_interior_first=nc.get("corr_interior_first", True),
        )
        model = Os2dModel(m_cfg)
        p = jax.tree_util.tree_map(lambda x: x, params_np)
        res = evaluate(eval_loader, model, p, cfg)
        results[name] = res

        import pickle

        with open(os.path.join(args.root, f"dets_{name}",
                               "sens_detections.pkl"), "rb") as f:
            d = pickle.load(f)
        detections[name] = list(
            zip(d["boxes_xyxy"], d["scores"], d["labels"])
        )
        print(f"{name}: mAP@0.50={res['mAP@0.50']:.4f} "
              f"recall={res['recall@0.50']:.4f}", flush=True)

    print("\n=== deltas vs fp32_high ===")
    base = detections["fp32_high"]
    for name in configs:
        if name == "fp32_high":
            continue
        deltas, ious, unmatched = match_detections(base, detections[name])
        print(
            f"{name}: dmAP={results[name]['mAP@0.50'] - results['fp32_high']['mAP@0.50']:+.4f} "
            f"score_delta mean={deltas.mean() if len(deltas) else 0:.2e} "
            f"max={deltas.max() if len(deltas) else 0:.2e} "
            f"match_iou_mean={ious.mean() if len(ious) else 0:.4f} "
            f"unmatched={unmatched}/{sum(len(b[1]) for b in base)}"
        )


if __name__ == "__main__":
    main()

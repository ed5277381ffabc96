"""Release-checkpoint parity runbook (VERDICT r2 item 3).

One command between "the released artifacts are available" and "the
north-star accuracy gate passed": given the reference's released checkpoints
(https://github.com/aosokin/os2d, `os2d_v2-train.pth` etc.) and the GroZi-3.2k
data root, run the full published eval protocol (1280px longer side, 7-scale
pyramid [0.5..1.6], NMS IoU 0.3, VOC mAP@0.5 — /root/reference/README.md:63-113
and BASELINE.md) and assert the published numbers:

  row                    expected mAP@0.5 (grozi-val-new-cl)
  v2-train               90.65
  v1-train               88.71   (ResNet101, simplified affine)
  v2-init                86.07
  v2-train-single-scale  85.58   (pyramid [1.0])

Usage (all rows; checkpoints resolved by their release filenames):
  python tools/parity_release.py --models-dir /path/to/models \
      --data-path /path/to/data            # data/grozi/... as in the reference

  python tools/parity_release.py --row v2-train \
      --checkpoint /path/os2d_v2-train.pth --data-path /path/to/data

Options: --tol 0.3 (mAP tolerance), --mesh N (run eval over an N-device mesh;
-1 = all visible devices), --rows a,b,c (subset).

Prints one machine-readable JSON line per row plus an overall verdict line
{"parity_gate": "PASS"|"FAIL", ...}; exit code 0 iff every requested row
passed. Expected runtime: a few minutes per row on one v5e chip (the val set
is 680 images; see bench.py for the per-image rate).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

ROWS = {
    # row -> (release filename, expected mAP@0.5, model overrides, eval overrides)
    "v2-train": ("os2d_v2-train.pth", 90.65, {}, {}),
    "v1-train": (
        "os2d_v1-train.pth", 88.71,
        {"backbone_arch": "resnet101", "use_simplified_affine_model": True,
         "use_inverse_geom_model": False},
        {},
    ),
    "v2-init": ("os2d_v2-init.pth", 86.07, {}, {}),
    "v2-train-single-scale": (
        "os2d_v2-train.pth", 85.58, {},
        {"scales_of_image_pyramid": [1.0]},
    ),
}
DATASET = "grozi-val-new-cl"
SCALE = 1280


def run_row(row, checkpoint, data_path, tol, mesh_axis):
    import jax

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataloader import build_eval_dataloaders_from_cfg
    from os2d_tpu.engine.train import evaluate_model
    from os2d_tpu.models import Os2dConfig, Os2dModel
    from os2d_tpu.models.os2d import load_checkpoint_file

    _, expected, model_over, eval_over = ROWS[row]
    cfg = get_default_cfg()
    cfg.eval.dataset_names = [DATASET]
    cfg.eval.dataset_scales = [SCALE]
    cfg.eval.mAP_iou_thresholds = [0.5]
    cfg.eval.class_image_augmentation = ""
    for k, v in eval_over.items():
        setattr(cfg.eval, k, v)
    for k, v in model_over.items():
        setattr(cfg.model, k, v)

    model_cfg = Os2dConfig(
        backbone_arch=cfg.model.backbone_arch.lower(),
        merge_branch_parameters=cfg.model.merge_branch_parameters,
        use_inverse_geom_model=cfg.model.use_inverse_geom_model,
        use_simplified_affine_model=cfg.model.use_simplified_affine_model,
        use_group_norm=cfg.model.use_group_norm,
        class_image_size=cfg.model.class_image_size,
        normalization_mean=tuple(cfg.model.normalization_mean),
        normalization_std=tuple(cfg.model.normalization_std),
        compute_dtype=cfg.tpu.compute_dtype,
        resample_precision=cfg.tpu.get("resample_precision", "default"),
    )
    model = Os2dModel(model_cfg)
    params, _ = load_checkpoint_file(checkpoint, model_cfg)

    img_normalization = {
        "mean": cfg.model.normalization_mean,
        "std": cfg.model.normalization_std,
    }
    loaders = build_eval_dataloaders_from_cfg(
        cfg, img_normalization, data_path=data_path
    )

    mesh = None
    if mesh_axis not in (0, 1):
        from os2d_tpu.parallel import make_mesh

        n_dev = len(jax.devices())
        want = n_dev if mesh_axis < 0 else mesh_axis
        if want > 1 and n_dev >= want:
            mesh = make_mesh(want)

    meters = evaluate_model(loaders, model, params, cfg, mesh=mesh)
    measured = float(meters[DATASET]["mAP@0.50"]) * 100.0
    ok = abs(measured - expected) <= tol
    print(json.dumps({
        "row": row, "checkpoint": checkpoint, "dataset": DATASET,
        "scale": SCALE,
        "pyramid": list(cfg.eval.scales_of_image_pyramid),
        "mAP@0.50": round(measured, 3), "expected": expected,
        "tol": tol, "pass": ok,
    }))
    return ok, measured


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--models-dir", default="",
                    help="directory holding the released .pth checkpoints")
    ap.add_argument("--checkpoint", default="",
                    help="explicit checkpoint path (single --row mode)")
    ap.add_argument("--data-path", required=True,
                    help="data root containing grozi/ (reference layout)")
    ap.add_argument("--row", default="", help="single row to run")
    ap.add_argument("--rows", default=",".join(ROWS),
                    help="comma-separated rows (default: all)")
    ap.add_argument("--tol", type=float, default=0.3,
                    help="mAP tolerance in points (default 0.3)")
    ap.add_argument("--mesh", type=int, default=1,
                    help="mesh size for eval (-1 = all devices, 1 = single)")
    args = ap.parse_args()

    rows = [args.row] if args.row else [
        r for r in args.rows.split(",") if r.strip()
    ]
    for r in rows:
        if r not in ROWS:
            ap.error(f"unknown row {r!r}; choose from {sorted(ROWS)}")
    if args.row and args.checkpoint:
        paths = {args.row: args.checkpoint}
    else:
        if not args.models_dir:
            ap.error("--models-dir is required unless --row + --checkpoint")
        paths = {r: os.path.join(args.models_dir, ROWS[r][0]) for r in rows}
    missing = [p for p in paths.values() if not os.path.isfile(p)]
    if missing:
        ap.error(f"checkpoint(s) not found: {missing}")

    results = {}
    all_ok = True
    for r in rows:
        ok, measured = run_row(r, paths[r], args.data_path, args.tol,
                               args.mesh)
        results[r] = {"mAP@0.50": round(measured, 3),
                      "expected": ROWS[r][1], "pass": ok}
        all_ok = all_ok and ok
    print(json.dumps({
        "parity_gate": "PASS" if all_ok else "FAIL",
        "tol": args.tol, "rows": results,
    }))
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()

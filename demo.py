"""End-to-end demo: detect query classes in an input image.

Script equivalent of the reference demo.ipynb (single-image, two-class
walkthrough including the staged API: feature extraction / class head /
head application / decoding / visualization).
"""

import argparse
import os

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from os2d_tpu.data.dataloader import image_to_normalized_array
from os2d_tpu.engine.decode import decode_pyramid
from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
from os2d_tpu.models.os2d import load_checkpoint_file
from os2d_tpu.structures.feature_map import FeatureMapSize, exact_resize_area
from os2d_tpu.utils.logger import setup_logger
from os2d_tpu.utils.visualization import show_detections


def load_image(path):
    with open(path, "rb") as f:
        img = Image.open(f)
        if img.mode != "RGB":
            img = img.convert("RGB")
        img.load()
    return img


def main():
    parser = argparse.ArgumentParser(description="OS2D one-shot detection demo")
    parser.add_argument("--input", required=True, help="input image")
    parser.add_argument("--query", required=True, nargs="+", help="class images")
    parser.add_argument("--checkpoint", default="", help="model checkpoint")
    parser.add_argument("--input-size", type=int, default=1500,
                        help="longer side for the input image")
    parser.add_argument("--class-size", type=int, default=240)
    parser.add_argument("--score-threshold", type=float, default=0.4)
    parser.add_argument("--max-detections", type=int, default=10)
    parser.add_argument("--output", default="demo_detections.png")
    args = parser.parse_args()

    logger = setup_logger("OS2D.demo")
    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    if args.checkpoint:
        params, _ = load_checkpoint_file(args.checkpoint, model_cfg)
        logger.info(f"Loaded checkpoint {args.checkpoint}")
    else:
        params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
        logger.info("No checkpoint provided - using random init (for smoke runs)")

    # --- staged pipeline (as in demo.ipynb) ---
    input_pil = load_image(args.input)
    ow, oh = input_pil.size
    ratio = args.input_size / max(ow, oh)
    resized = input_pil.resize((int(ow * ratio), int(oh * ratio)), Image.BILINEAR)
    img_arr = image_to_normalized_array(
        resized, {"mean": model_cfg.normalization_mean, "std": model_cfg.normalization_std}
    )
    logger.info(f"Input {ow}x{oh} -> {resized.size}")

    # (1) input feature map
    feature_map = model.extract_features(params, jnp.asarray(img_arr[None]))
    logger.info(f"Feature map: {feature_map.shape}")

    # (2) class heads from query images
    queries = []
    for qpath in args.query:
        q = load_image(qpath)
        qs = exact_resize_area(w=q.size[0], h=q.size[1],
                               target_area_side=args.class_size)
        q = q.resize((qs.w, qs.h), Image.BILINEAR)
        queries.append(
            jnp.asarray(image_to_normalized_array(
                q, {"mean": model_cfg.normalization_mean,
                    "std": model_cfg.normalization_std}
            ))
        )
    class_head = model.build_class_head_from_images(params, queries)
    logger.info(f"Class feature bank: {class_head.class_feats.shape}")

    # (3) head + (4) decode
    out = model.apply_head(params, feature_map, class_head)
    img_size = FeatureMapSize(w=resized.size[0], h=resized.size[1])
    det = decode_pyramid(
        [out["loc"][0]], [out["cls"][0]], [img_size],
        [(ow / img_size.w, oh / img_size.h)],
        nms_iou_threshold=0.3, top_k=64,
        corners_pyramid=[out["corners"][0]],
    )

    boxes = np.asarray(det["boxes"])
    scores = np.asarray(det["scores"])
    valid = np.asarray(det["valid"])
    corners = np.asarray(det["corners"])

    flat_boxes, flat_scores, flat_labels, flat_corners = [], [], [], []
    for row in range(boxes.shape[0]):
        m = valid[row] & (scores[row] > args.score_threshold)
        flat_boxes.append(boxes[row][m])
        flat_scores.append(scores[row][m])
        flat_labels.append(np.full(int(m.sum()), row))
        flat_corners.append(corners[row][m])
    flat_boxes = np.concatenate(flat_boxes) if flat_boxes else np.zeros((0, 4))
    flat_scores = np.concatenate(flat_scores) if flat_scores else np.zeros((0,))
    flat_labels = np.concatenate(flat_labels) if flat_labels else np.zeros((0,))
    flat_corners = np.concatenate(flat_corners) if flat_corners else np.zeros((0, 8))

    for s, b, l in zip(flat_scores, flat_boxes, flat_labels):
        logger.info(f"class {int(l)}: score {s:.3f} box {b.round(1).tolist()}")

    out_path = show_detections(
        np.asarray(input_pil, np.float32) / 255.0 * np.float32(1.0),
        flat_boxes, flat_scores, flat_labels, corners=flat_corners,
        max_detections=args.max_detections, save_path=args.output,
    )
    logger.info(f"Saved visualization to {out_path}")


if __name__ == "__main__":
    main()

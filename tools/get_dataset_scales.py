"""Compute per-dataset eval scales so the median object size ~= 240px.

Port of the reference data/get_dataset_scales.py:1-66: for each dataset,
measure the distribution of (non-difficult) GT object sizes at the stored
image size and report the image scale that brings the median object to the
anchor size (240).
"""

import argparse
import math
import os
import sys
from collections import OrderedDict

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from os2d_tpu.data.dataset import build_dataset_by_name
from os2d_tpu.structures.feature_map import FeatureMapSize
from os2d_tpu.utils.logger import setup_logger

DATASET_LIST = [
    "grozi-train", "grozi-val-new-cl", "dairy", "paste-v", "paste-f",
    "instre-s1-train", "instre-s1-val", "instre-s2-train", "instre-s2-val",
]


def get_image_sizes(dataset):
    sizes = OrderedDict()
    images = dataset.gtboxframe.groupby(["imageid", "imagefilename"]).size().reset_index()
    for _, datum in images.iterrows():
        img = dataset._get_dataset_image_by_id(datum["imageid"])
        sizes[datum["imageid"]] = FeatureMapSize.from_image(img)
    return sizes


def compute_object_size_stats(gtboxframe, image_sizes_by_id):
    object_sizes = []
    for _, datum in gtboxframe.iterrows():
        img_size = image_sizes_by_id[datum["imageid"]]
        box_w = (datum["rx"] - datum["lx"]) * img_size.w
        box_h = (datum["by"] - datum["ty"]) * img_size.h
        if not datum["difficult"]:
            object_sizes.append(math.sqrt(max(box_w * box_h, 0.0)))
    object_sizes.sort()
    n = len(object_sizes)
    return (
        sum(object_sizes) / n,
        object_sizes[n // 2],
        object_sizes[n // 10],
        object_sizes[n * 9 // 10],
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-path", default=os.environ.get("DATA_PATH", "data"))
    parser.add_argument("--target-object-size", type=int, default=240)
    parser.add_argument("--datasets", nargs="+", default=DATASET_LIST)
    args = parser.parse_args()

    logger = setup_logger("get_dataset_scales")
    for name in args.datasets:
        try:
            dataset = build_dataset_by_name(args.data_path, name, eval_scale=None)
        except (FileNotFoundError, OSError) as e:
            logger.warning(f"Skipping {name}: {e}")
            continue
        sizes = get_image_sizes(dataset)
        avg, median, q10, q90 = compute_object_size_stats(dataset.gtboxframe, sizes)
        logger.info(
            f"{name}: avg object {avg:0.1f}px (median {median:0.1f}, "
            f"q10 {q10:0.1f}, q90 {q90:0.1f}) at image size {dataset.image_size}"
        )
        logger.info(
            f"{name}: recommended eval scale = "
            f"{int(dataset.image_size * args.target_object_size / median)}"
        )


if __name__ == "__main__":
    main()

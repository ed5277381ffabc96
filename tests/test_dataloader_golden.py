"""Integration parity: reference dataloader batch targets vs device encoding.

Builds the SAME synthetic dataset on disk for both stacks (augmentation off so
no RNG enters), lets the reference DataloaderOneShotDetection assemble a batch
with host-encoded loc/cls targets, and requires this framework's device-side
target encoding to reproduce them.
"""

import os

import numpy as np
import pandas as pd
import pytest
import torch
from PIL import Image

from reference_oracle import import_reference

import_reference()

import jax.numpy as jnp  # noqa: E402

IMG_W, IMG_H, PATCH = 480, 384, 160


def write_dataset(root, rng):
    os.makedirs(os.path.join(root, "classes", "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "src"), exist_ok=True)
    rows = []
    for cid in (0, 1, 2):
        Image.fromarray(
            rng.randint(0, 255, (96, 96, 3), np.uint8)
        ).save(os.path.join(root, "classes", "images", f"{cid}.jpg"))
    for image_id in range(2):
        img = rng.randint(0, 255, (IMG_H, IMG_W, 3), np.uint8)
        Image.fromarray(img).save(os.path.join(root, "src", f"{image_id}.jpg"))
        for cid in (0, 1):
            x0 = rng.randint(0, IMG_W - PATCH)
            y0 = rng.randint(0, IMG_H - PATCH)
            rows.append(
                dict(imageid=image_id, imagefilename=f"{image_id}.jpg",
                     classid=cid, classfilename=f"{cid}.jpg",
                     gtbboxid=len(rows), difficult=int(rng.rand() < 0.3),
                     lx=x0 / IMG_W, ty=y0 / IMG_H,
                     rx=(x0 + PATCH) / IMG_W, by=(y0 + PATCH) / IMG_H)
            )
    return pd.DataFrame(rows)


def test_reference_batch_targets_match_device_encoding(tmp_path):
    rng = np.random.RandomState(0)
    df = write_dataset(str(tmp_path), rng)

    # ---- reference stack ----
    from os2d.data.dataset import DatasetOneShotDetection as RefDataset
    from os2d.data.dataloader import DataloaderOneShotDetection as RefLoader
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
    ref_dataset = RefDataset(
        df, gt_path=os.path.join(str(tmp_path), "classes", "images"),
        image_path=os.path.join(str(tmp_path), "src"), name="synth",
        image_size=IMG_W, eval_scale=IMG_W, cache_images=True,
    )
    ref_loader = RefLoader(
        dataset=ref_dataset, box_coder=coder, batch_size=2,
        img_normalization={"mean": [0.485, 0.456, 0.406],
                           "std": [0.229, 0.224, 0.225]},
        gt_image_size=240, do_augmentation=False,
    )
    (ref_images, ref_class_images, ref_loc_t, ref_cls_t, ref_class_ids,
     _, _, _, _) = ref_loader.get_batch(0)

    # ---- this framework ----
    from os2d_tpu.data.dataset import DatasetOneShotDetection
    from os2d_tpu.data.dataloader import DataloaderOneShotDetection
    from os2d_tpu.engine.decode import default_boxes_for_image_size
    from os2d_tpu.engine.targets import encode_targets_single_image

    my_dataset = DatasetOneShotDetection(
        df, gt_path=os.path.join(str(tmp_path), "classes", "images"),
        image_path=os.path.join(str(tmp_path), "src"), name="synth",
        image_size=IMG_W, eval_scale=IMG_W, cache_images=True,
    )
    my_loader = DataloaderOneShotDetection(
        dataset=my_dataset, batch_size=2, do_augmentation=False,
        class_shape_palette=None,  # exact resize, like the reference
    )
    batch = my_loader.get_batch(0)

    assert list(batch["class_ids"]) == sorted(int(c) for c in ref_class_ids)
    # image tensors: reference is NCHW torch, mine NHWC numpy
    np.testing.assert_allclose(
        batch["images"].transpose(0, 3, 1, 2), ref_images.numpy(),
        rtol=1e-4, atol=1e-4,
    )
    # class images match after layout transpose (exact-resize mode)
    for mine, ref in zip(batch["class_images"], ref_class_images):
        np.testing.assert_allclose(
            mine.transpose(2, 0, 1), ref.numpy(), rtol=1e-4, atol=1e-4
        )

    # device-side target encoding reproduces the reference's host encoding
    d_boxes = default_boxes_for_image_size(batch["img_size"])
    num_classes = len(batch["class_ids"])
    for i in range(2):
        loc_t, cls_t = encode_targets_single_image(
            jnp.asarray(batch["gt_boxes"][i]),
            jnp.asarray(batch["gt_labels"][i]),
            jnp.asarray(batch["gt_difficult"][i]),
            jnp.asarray(batch["gt_valid"][i]),
            d_boxes, num_classes,
        )
        np.testing.assert_array_equal(
            np.asarray(cls_t), ref_cls_t[i].numpy()
        )
        np.testing.assert_allclose(
            np.asarray(loc_t), ref_loc_t[i].numpy(), rtol=1e-4, atol=1e-4
        )

"""Dataloader: bucketed batching, augmentation pipeline, class-image handling.

Port of DataloaderOneShotDetection (os2d/data/dataloader.py:146-616) with
TPU-first output contracts:
  - images are numpy NHWC float32, already mean/std-normalized;
  - GT annotations are returned as PADDED arrays (boxes/labels/difficult/valid)
    so target encoding and remapping run on device inside the jitted train
    step (instead of the reference's host-side per-image encode);
  - class images are resized to a small SHAPE PALETTE by default (area ~=
    class_image_size^2, nearest aspect) so the label-branch backbone compiles
    for a bounded set of shapes; exact reference resize is available with
    palette=None for strict parity runs.
"""

from __future__ import annotations

import copy
import logging
import math
import random
from typing import List, Optional

import numpy as np
from PIL import Image

from ..structures.feature_map import FeatureMapSize, exact_resize_area
from ..structures.host_boxes import HostBoxes, TransformList
from . import transforms as T
from .dataset import DatasetOneShotDetection

IMG_MEAN = (0.485, 0.456, 0.406)
IMG_STD = (0.229, 0.224, 0.225)
GT_PAD_MULTIPLE = 8


def make_class_shape_palette(class_image_size: int = 240, num_aspects: int = 25,
                             max_aspect: float = 3.0):
    """Shapes with area ~= class_image_size^2 across log-spaced aspect ratios."""
    aspects = np.geomspace(1.0 / max_aspect, max_aspect, num_aspects)
    shapes = []
    for r in aspects:  # r = h / w
        s = exact_resize_area(w=1000, h=int(1000 * r), target_area_side=class_image_size)
        if (s.w, s.h) not in shapes:
            shapes.append((s.w, s.h))
    return shapes


def snap_to_palette(w: int, h: int, palette) -> FeatureMapSize:
    """Nearest palette shape by log-aspect."""
    target = math.log(h / w)
    best = min(palette, key=lambda s: abs(math.log(s[1] / s[0]) - target))
    return FeatureMapSize(w=best[0], h=best[1])


def image_to_normalized_array(img, img_normalization=None) -> np.ndarray:
    """PIL -> [H, W, 3] float32, scaled to [0,1] and mean/std normalized."""
    arr = np.asarray(img, np.float32) / 255.0
    if img_normalization is not None:
        mean = np.asarray(img_normalization["mean"], np.float32)
        std = np.asarray(img_normalization["std"], np.float32)
        arr = (arr - mean) / std
    return arr


class DataAugmentationParams:
    """Parameter bundle (os2d/engine/augmentation.py:6-87)."""

    def __init__(self, random_flip_batches, random_crop_size, random_crop_scale,
                 jitter_aspect_ratio, scale_jitter, random_color_distortion,
                 random_crop_label_images, min_box_coverage):
        self.batch_random_hflip = random_flip_batches
        self.batch_random_vflip = random_flip_batches
        self.do_random_color = random_color_distortion
        self.scale_jitter = scale_jitter
        self.jitter_aspect_ratio = jitter_aspect_ratio
        self.do_random_crop = random_crop_size is not None
        self.random_crop_size = random_crop_size
        self.random_crop_scale = random_crop_scale
        self.random_interpolation = True
        self.coverage_keep_threshold = 0.7
        self.coverage_remove_threshold = 0.3
        self.max_trial = 100
        self.min_box_coverage = min_box_coverage
        self.do_random_crop_label_images = random_crop_label_images

    def random_distort(self, img):
        return T.random_distort(img) if self.do_random_color else img

    def random_crop(self, img, boxes=None, transform_list=None):
        return T.crop(
            img, crop_position=None, random_crop_size=self.random_crop_size,
            random_crop_scale=self.random_crop_scale,
            scale_jitter=self.scale_jitter,
            jitter_aspect_ratio=self.jitter_aspect_ratio,
            coverage_keep_threshold=self.coverage_keep_threshold,
            coverage_remove_threshold=self.coverage_remove_threshold,
            max_trial=self.max_trial, min_box_coverage=self.min_box_coverage,
            boxes=boxes, transform_list=transform_list,
        )

    def crop_image(self, img, crop_position, boxes=None, transform_list=None,
                   random_crop_size=None):
        return T.crop(
            img, crop_position=crop_position, random_crop_size=random_crop_size,
            random_crop_scale=self.random_crop_scale,
            scale_jitter=self.scale_jitter,
            jitter_aspect_ratio=self.jitter_aspect_ratio,
            coverage_keep_threshold=self.coverage_keep_threshold,
            coverage_remove_threshold=self.coverage_remove_threshold,
            max_trial=self.max_trial, min_box_coverage=self.min_box_coverage,
            boxes=boxes, transform_list=transform_list,
        )

    def random_crop_label_image(self, img):
        if self.do_random_crop_label_images:
            ar = img.size[0] / img.size[1]
            new_ar = random.uniform(ar * self.jitter_aspect_ratio,
                                    ar / self.jitter_aspect_ratio)
            w = int(min(img.size[0], img.size[1] * new_ar))
            h = int(min(img.size[0] / new_ar, img.size[1]))
            img = self.crop_image(img, None,
                                  random_crop_size=FeatureMapSize(w=w, h=h))[0]
        return img


class DataloaderOneShotDetection:
    def __init__(self, dataset: DatasetOneShotDetection, batch_size=4,
                 class_batch_size=None, img_normalization=None, gt_image_size=240,
                 random_flip_batches=False, random_crop_size=None,
                 random_crop_scale=1.0, random_color_distortion=False,
                 jitter_aspect_ratio=1.0, scale_jitter=1.0,
                 random_crop_class_images=False, min_box_coverage=0.7,
                 pyramid_scales_eval=(1,), do_augmentation=False,
                 mine_extra_class_images=False,
                 class_shape_palette="default",  # "default" | None (exact) | list
                 images_uint8=False,  # train batches ship uint8, normalize on device
                 logger_prefix="OS2D"):
        self.logger = logging.getLogger(f"{logger_prefix}.dataloader")
        self.dataset = dataset
        # per-instance RNG for batch-level draws (shuffle order, label
        # sampling, batch flips): seeded once from the global stream (so
        # set_random_seed still controls it) but hermetic afterwards — other
        # consumers of the global RNG can't perturb batch composition
        self._rng = random.Random(random.getrandbits(64))
        self._np_rng = np.random.RandomState(self._rng.getrandbits(32))
        self.img_normalization = img_normalization or {"mean": IMG_MEAN, "std": IMG_STD}
        self.gt_image_size = gt_image_size
        self.hardnegdata_per_imageid = None
        self.mine_extra_class_images = mine_extra_class_images
        self.images_uint8 = images_uint8
        self.device_class_cache = None  # attach_device_class_cache()
        self.pyramid_scales_eval = list(pyramid_scales_eval)
        self.num_pyramid_levels = len(self.pyramid_scales_eval)

        if class_shape_palette == "default":
            self.class_shape_palette = make_class_shape_palette(gt_image_size)
        else:
            self.class_shape_palette = class_shape_palette  # None -> exact resize

        if do_augmentation:
            self.data_augmentation = DataAugmentationParams(
                random_flip_batches=random_flip_batches,
                random_crop_size=random_crop_size,
                random_crop_scale=random_crop_scale,
                jitter_aspect_ratio=jitter_aspect_ratio,
                scale_jitter=scale_jitter,
                random_color_distortion=random_color_distortion,
                random_crop_label_images=random_crop_class_images,
                min_box_coverage=min_box_coverage,
            )
            self.use_buckets = random_crop_size is None
        else:
            self.data_augmentation = None
            self.use_buckets = True

        self.batch_size = batch_size
        self.max_batch_labels = class_batch_size

        if self.dataset.have_images_read:
            self._create_buckets(merge_one_bucket=not self.use_buckets)
            if self.mine_extra_class_images:
                self._mine_extra_class_images()

    def attach_device_class_cache(self, cache):
        """Serve class images from a device-resident (class, method) stack
        (data/class_cache.py) instead of per-batch host PIL work + upload.
        The per-class resample-method draw still comes from the same global
        RNG call T.resize would make, so batch composition and the method
        stream are identical to the host path."""
        if cache is not None:
            cache.validate_loader(self)
        self.device_class_cache = cache

    def get_name(self):
        return self.dataset.get_name()

    def get_eval_scale(self):
        return self.dataset.get_eval_scale()

    # ---- buckets ----
    def _create_buckets(self, merge_one_bucket=False):
        if not merge_one_bucket:
            self.buckets = self.dataset.split_images_into_buckets_by_size()
        else:
            self.buckets = [list(self.dataset.image_size_per_image_id.keys())]
        self.num_buckets = len(self.buckets)
        self.bucket_sizes = [len(b) for b in self.buckets]
        self.num_batches_per_bucket = [
            math.ceil(s / self.batch_size) for s in self.bucket_sizes
        ]
        self.num_batches = sum(self.num_batches_per_bucket)
        self.bucket_order = [
            (i_bucket, i_batch)
            for i_bucket in range(self.num_buckets)
            for i_batch in range(self.num_batches_per_bucket[i_bucket])
        ]

    def shuffle(self, shuffle_buckets=True):
        self._rng.shuffle(self.bucket_order)
        if shuffle_buckets:
            for bucket in self.buckets:
                self._rng.shuffle(bucket)

    def __len__(self):
        return self.num_batches

    # ---- class images ----
    def _mine_extra_class_images(self):
        """Crop every non-difficult GT box as an extra view of its class
        (os2d/data/dataloader.py:210-229)."""
        self.label_image_collection = {}
        for ids_b in self.buckets:
            for image_id in ids_b:
                img = self.dataset._get_dataset_image_by_id(image_id)
                boxes = self.dataset.get_image_annotation_for_imageid(image_id)
                difficult = boxes.get_field("difficult")
                labels = boxes.get_field("labels")
                for i in range(len(boxes)):
                    if not bool(difficult[i]):
                        img_cropped, _, _, _ = T.crop(
                            img, crop_position=boxes[i:i + 1]
                        )
                        label = int(labels[i])
                        self.label_image_collection.setdefault(label, []).append(
                            img_cropped
                        )

    def get_class_images_and_sizes(self, class_ids, do_augmentation=False):
        if self.mine_extra_class_images and do_augmentation:
            class_images = []
            for class_id in class_ids:
                collection = getattr(self, "label_image_collection", {}).get(class_id)
                if collection:
                    pick = self._rng.randint(0, len(collection))
                    img = (
                        self.dataset.gt_images_per_classid[class_id]
                        if pick == 0
                        else collection[pick - 1]
                    )
                else:
                    img = self.dataset.gt_images_per_classid[class_id]
                class_images.append(img)
        else:
            class_images = [
                self.dataset.gt_images_per_classid[c] for c in class_ids
            ]
        sizes = [FeatureMapSize.from_image(img) for img in class_images]
        return class_images, sizes

    def _transform_image_gt(self, img, do_augmentation=True, hflip=False,
                            vflip=False, do_resize=True, as_uint8=False):
        do_augmentation = do_augmentation and self.data_augmentation is not None
        img, _ = T.transpose(img, hflip=hflip, vflip=vflip)
        if do_augmentation:
            img = self.data_augmentation.random_distort(img)
            img = self.data_augmentation.random_crop_label_image(img)
        if do_resize:
            random_interp = (
                self.data_augmentation.random_interpolation if do_augmentation else False
            )
            size_old = FeatureMapSize.from_image(img)
            if self.class_shape_palette is not None:
                size_new = snap_to_palette(size_old.w, size_old.h,
                                           self.class_shape_palette)
            else:
                size_new = exact_resize_area(
                    w=size_old.w, h=size_old.h, target_area_side=self.gt_image_size
                )
            img, _ = T.resize(img, target_size=size_new,
                              random_interpolation=random_interp)
        if as_uint8:
            # uint8 ships straight to the device, which normalizes there
            # (bit-equal to the host fp32 path, minus a rint round trip)
            return np.asarray(img, np.uint8)
        return image_to_normalized_array(img, self.img_normalization)

    def get_all_class_images(self, do_resize=True):
        class_ids = sorted(list(self.dataset.get_class_ids()))
        class_images, class_image_sizes = self.get_class_images_and_sizes(
            class_ids, do_augmentation=False
        )
        arrays = [
            self._transform_image_gt(img, do_augmentation=False, do_resize=do_resize)
            for img in class_images
        ]
        return arrays, class_image_sizes, class_ids

    # ---- data images ----
    def _transform_image_to_pyramid(self, image_id, boxes=None,
                                    do_augmentation=True, hflip=False, vflip=False,
                                    pyramid_scales=(1,), mined_data=None,
                                    as_uint8=False):
        img = self.dataset._get_dataset_image_by_id(image_id)
        img_size = FeatureMapSize.from_image(img)
        do_augmentation = do_augmentation and self.data_augmentation is not None

        if boxes is None:
            boxes = HostBoxes.create_empty(img_size)
        mask_cutoff = np.zeros(len(boxes), bool)
        mask_difficult = np.zeros(len(boxes), bool)

        box_inverse_transform = TransformList()
        img, boxes = T.transpose(img, hflip=hflip, vflip=vflip, boxes=boxes,
                                 transform_list=box_inverse_transform)

        crop_position = None
        if mined_data is not None:
            crop_position = HostBoxes(
                np.asarray(mined_data["crop_position_xyxy"], np.float32).reshape(1, 4),
                img_size,
            )
            if hflip or vflip:
                if hflip:
                    crop_position = crop_position.transpose(0)
                if vflip:
                    crop_position = crop_position.transpose(1)

        if do_augmentation and self.data_augmentation.do_random_crop:
            if crop_position is None:
                img, boxes, mask_cutoff, mask_difficult = (
                    self.data_augmentation.random_crop(
                        img, boxes=boxes, transform_list=box_inverse_transform
                    )
                )
            else:
                img, boxes, mask_cutoff, mask_difficult = (
                    self.data_augmentation.crop_image(
                        img, crop_position, boxes=boxes,
                        transform_list=box_inverse_transform,
                    )
                )
            img, boxes = T.resize(
                img, target_size=self.data_augmentation.random_crop_size,
                random_interpolation=self.data_augmentation.random_interpolation,
                boxes=boxes, transform_list=box_inverse_transform,
            )
        if do_augmentation:
            img = self.data_augmentation.random_distort(img)

        random_interp = (
            self.data_augmentation.random_interpolation if do_augmentation else False
        )
        img_size = FeatureMapSize.from_image(img)
        pyramid_sizes = [
            FeatureMapSize(w=int(img_size.w * s), h=int(img_size.h * s))
            for s in pyramid_scales
        ]
        img_pyramid, boxes_pyramid, transform_pyramid = [], [], []
        for p_size in pyramid_sizes:
            t_this = copy.deepcopy(box_inverse_transform)
            p_img, p_boxes = T.resize(
                img, target_size=p_size, random_interpolation=random_interp,
                boxes=boxes, transform_list=t_this,
            )
            transform_pyramid.append(t_this)
            img_pyramid.append(
                np.asarray(p_img, np.uint8) if as_uint8
                else image_to_normalized_array(p_img, self.img_normalization))
            boxes_pyramid.append(p_boxes)
        return img_pyramid, boxes_pyramid, mask_cutoff, mask_difficult, transform_pyramid

    def _transform_image(self, image_id, boxes=None, do_augmentation=True,
                         hflip=False, vflip=False, mined_data=None,
                         as_uint8=False):
        p_img, p_boxes, mc, md, p_t = self._transform_image_to_pyramid(
            image_id, boxes=boxes, do_augmentation=do_augmentation,
            hflip=hflip, vflip=vflip, pyramid_scales=(1,), mined_data=mined_data,
            as_uint8=as_uint8,
        )
        return p_img[0], p_boxes[0], mc, md, p_t[0]

    @staticmethod
    def convert_label_ids_global_to_local(label_ids_global, class_ids):
        return np.asarray(
            [
                class_ids.index(int(lid)) if int(lid) in class_ids else -1
                for lid in label_ids_global
            ],
            np.int64,
        )

    def set_hard_negative_data(self, hardnegdata_per_imageid):
        self.hardnegdata_per_imageid = copy.deepcopy(hardnegdata_per_imageid)

    # ---- batching ----
    def get_image_ids_for_batch_index(self, index):
        assert index < self.num_batches
        i_bucket, i_batch = self.bucket_order[index]
        return self.buckets[i_bucket][
            i_batch * self.batch_size: (i_batch + 1) * self.batch_size
        ]

    def get_batch(self, index, use_all_labels=False):
        return self._prepare_batch(
            self.get_image_ids_for_batch_index(index), use_all_labels=use_all_labels
        )

    def _prepare_batch(self, image_ids, use_all_labels=False):
        """Assemble one training batch (os2d/data/dataloader.py:497-613).

        Returns a dict with device-ready numpy arrays: images [B, H, W, 3],
        class_images (list of [h, w, 3]), padded GT (gt_boxes [B, G, 4],
        gt_labels / gt_difficult / gt_valid), class_ids, plus host-side
        inverse transforms and HostBoxes for mining/visualization.
        """
        use_mined_data = self.hardnegdata_per_imageid is not None
        mined_data = {}
        if use_mined_data:
            batch_size = len(image_ids)
            num_neg = batch_size // 2
            roles = ["neg"] * num_neg + ["pos"] * (batch_size - num_neg)
            for image_id, role in zip(image_ids, roles):
                cands = self.hardnegdata_per_imageid[image_id]
                filtered = [d for d in cands if d["role"][: len(role)] == role]
                if not filtered:
                    filtered = cands
                mined_data[image_id] = filtered[self._rng.randrange(len(filtered))]

        batch_frame = self.dataset.get_dataframe_for_image_ids(image_ids)
        if not use_all_labels:
            class_ids = batch_frame["classid"].unique()
            mined_labels = [mined_data[i]["label_global"] for i in mined_data]
            max_batch_labels = (
                self.max_batch_labels
                if self.max_batch_labels is not None
                else class_ids.size + len(mined_labels) + 1
            )
            class_ids = np.unique(class_ids)
            self._np_rng.shuffle(class_ids)
            class_ids = class_ids[: max_batch_labels - len(mined_labels)]
            class_ids = np.unique(
                np.concatenate(
                    (class_ids, np.asarray(mined_labels, class_ids.dtype))
                )
            )
        else:
            class_ids = self.dataset.get_class_ids()
        class_ids = sorted(int(c) for c in class_ids)

        if self.data_augmentation is not None:
            batch_vflip = (
                self._rng.random() < 0.5 if self.data_augmentation.batch_random_vflip else False
            )
            batch_hflip = (
                self._rng.random() < 0.5 if self.data_augmentation.batch_random_hflip else False
            )
        else:
            batch_vflip = batch_hflip = False

        if self.device_class_cache is not None:
            # device-resident class stack: the only per-class randomness left
            # is the resample-method draw T.resize would make — make the SAME
            # global-RNG call (and ONLY under the same condition: T.resize
            # draws only when augmentation requests random interpolation,
            # else it deterministically uses BILINEAR) so the stream (and
            # thus every later batch-image draw) stays aligned with the host
            # path; pixels resolve on device via class_cache.gather (see
            # prepare_batch_arrays)
            random_interp = (self.data_augmentation is not None
                             and self.data_augmentation.random_interpolation)
            method_idx = [
                T._RESAMPLE_CHOICES.index(
                    random.choice(T._RESAMPLE_CHOICES) if random_interp
                    else Image.BILINEAR)
                for _ in class_ids
            ]
            class_images = None
            class_image_sizes = [
                self.device_class_cache.sizes[cid] for cid in class_ids
            ]
            class_gather = {
                "cache": self.device_class_cache,
                "class_ids": class_ids,
                "method_idx": method_idx,
                "hflip": batch_hflip,
                "vflip": batch_vflip,
            }
        else:
            # class images ship uint8 (they dominate the per-step host->device
            # payload at fp32: 15 x 240^2 x 3 x 4B ~= 10 MB); the jitted step
            # normalizes on device. Emitting uint8 directly skips the host
            # normalize->denormalize fp32 round trip entirely (measured ~55% of
            # the per-batch host cost together with the image path below).
            class_gather = None
            class_images_pil, _ = self.get_class_images_and_sizes(
                class_ids, do_augmentation=True
            )
            class_images = [
                self._transform_image_gt(
                    img, hflip=batch_hflip, vflip=batch_vflip,
                    as_uint8=self.images_uint8)
                for img in class_images_pil
            ]
            class_image_sizes = [
                FeatureMapSize(w=arr.shape[1], h=arr.shape[0])
                for arr in class_images
            ]

        batch_images = []
        batch_inverse_transform = []
        batch_boxes = []
        img_size = None
        for image_id in image_ids:
            boxes = self.dataset.get_image_annotation_for_imageid(image_id)
            local = self.convert_label_ids_global_to_local(
                boxes.get_field("labels"), class_ids
            )
            boxes.add_field("labels", local)
            img, boxes, mask_cutoff, mask_difficult, inv_t = self._transform_image(
                image_id, boxes, hflip=batch_hflip, vflip=batch_vflip,
                mined_data=mined_data.get(image_id),
                as_uint8=self.images_uint8,
            )
            difficult = boxes.get_field("difficult") | mask_difficult
            boxes.add_field("difficult", difficult)
            labels = boxes.get_field("labels")
            labels[mask_cutoff] = -2
            boxes.add_field("labels", labels)

            cur_size = FeatureMapSize(w=img.shape[1], h=img.shape[0])
            if img_size is None:
                img_size = cur_size
            else:
                assert img_size == cur_size, "Images in a batch should be of the same size"
            batch_images.append(img)
            batch_inverse_transform.append(inv_t)
            batch_boxes.append(boxes)

        # pad GT to a static G
        max_gt = max((len(b) for b in batch_boxes), default=0)
        g_pad = max(GT_PAD_MULTIPLE, math.ceil(max(max_gt, 1) / GT_PAD_MULTIPLE) * GT_PAD_MULTIPLE)
        b = len(image_ids)
        gt_boxes = np.zeros((b, g_pad, 4), np.float32)
        gt_labels = np.full((b, g_pad), -1, np.int32)
        gt_difficult = np.zeros((b, g_pad), bool)
        gt_valid = np.zeros((b, g_pad), bool)
        for i, boxes in enumerate(batch_boxes):
            n = len(boxes)
            if n:
                gt_boxes[i, :n] = boxes.bbox_xyxy
                gt_labels[i, :n] = boxes.get_field("labels")
                gt_difficult[i, :n] = boxes.get_field("difficult")
                gt_valid[i, :n] = True

        return {
            "images": np.stack(batch_images, 0),
            "class_images": class_images,
            "class_gather": class_gather,
            "class_ids": class_ids,
            "class_image_sizes": class_image_sizes,
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels,
            "gt_difficult": gt_difficult,
            "gt_valid": gt_valid,
            "img_size": img_size,
            "batch_box_inverse_transform": batch_inverse_transform,
            "batch_boxes": batch_boxes,
        }

    def unnorm_image(self, img):
        """Invert the mean/std normalization for visualization
        (os2d/data/dataloader.py:387-394). img: [H, W, 3] float array."""
        mean = np.asarray(self.img_normalization["mean"], np.float32)
        std = np.asarray(self.img_normalization["std"], np.float32)
        return np.clip(np.asarray(img) * std + mean, 0.0, 1.0)

    # ---- eval iteration ----
    def make_raw_iterator_for_all_images(self, batch_size=None):
        """Device-side-pyramid variant of make_iterator_for_all_images:
        yields the BASE images as uint8 host arrays plus the per-level target
        sizes, so one small transfer replaces seven float32 level transfers
        (see engine/pyramid.py). Augmentation-free eval only."""
        buckets_ids = self.dataset.split_images_into_buckets_by_size()
        batch_size = (
            max(len(ids) for ids in buckets_ids) if batch_size is None else batch_size
        )
        for ids_b in buckets_ids:
            for batch_start in range(0, len(ids_b), batch_size):
                batch_ids = ids_b[batch_start: batch_start + batch_size]
                base_images = []
                initial_sizes = []
                for image_id in batch_ids:
                    img = self.dataset._get_dataset_image_by_id(image_id)
                    base_images.append(np.asarray(img, np.uint8))
                    initial_sizes.append(
                        self.dataset.get_image_size_for_image_id(image_id)
                    )
                base = initial_sizes[0]
                level_sizes = [
                    FeatureMapSize(w=int(base.w * s), h=int(base.h * s))
                    for s in self.pyramid_scales_eval
                ]
                inverse_scales = [
                    [
                        (init.w / float(lv.w), init.h / float(lv.h))
                        for lv in level_sizes
                    ]
                    for init in initial_sizes
                ]
                yield batch_ids, base_images, level_sizes, inverse_scales, initial_sizes

    def make_iterator_for_all_images(self, batch_size=None,
                                     num_random_pyramid_scales=0):
        """Yields (batch_ids, pyramids, inverse_scales, transforms, initial_sizes):
        pyramids is a per-level list of [B, h_l, w_l, 3] arrays; inverse_scales a
        per-image list of per-level (sx, sy) back to original coords
        (os2d/data/dataloader.py:432-476)."""
        buckets_ids = self.dataset.split_images_into_buckets_by_size()
        batch_size = (
            max(len(ids) for ids in buckets_ids) if batch_size is None else batch_size
        )
        for ids_b in buckets_ids:
            for batch_start in range(0, len(ids_b), batch_size):
                batch_ids = ids_b[batch_start: batch_start + batch_size]
                if not num_random_pyramid_scales:
                    pyramid_scales = self.pyramid_scales_eval
                else:
                    lo = min(self.pyramid_scales_eval)
                    hi = max(self.pyramid_scales_eval)
                    pyramid_scales = [
                        self._rng.uniform(lo, hi) for _ in range(num_random_pyramid_scales)
                    ]

                per_image_pyramids = []
                per_image_transforms = []
                initial_sizes = []
                for image_id in batch_ids:
                    img_pyr, _, _, _, t_pyr = self._transform_image_to_pyramid(
                        image_id, boxes=None, do_augmentation=False,
                        pyramid_scales=pyramid_scales,
                    )
                    per_image_pyramids.append(img_pyr)
                    per_image_transforms.append(t_pyr)
                    initial_sizes.append(
                        self.dataset.get_image_size_for_image_id(image_id)
                    )

                pyramids = [
                    np.stack([p[i_p] for p in per_image_pyramids], 0)
                    for i_p in range(len(pyramid_scales))
                ]
                inverse_scales = [
                    [t.as_scale_xy() for t in t_pyr] for t_pyr in per_image_transforms
                ]
                yield batch_ids, pyramids, inverse_scales, per_image_transforms, initial_sizes


def build_eval_dataloaders_from_cfg(cfg, img_normalization=None, datasets_for_eval=(),
                                    data_path="", logger_prefix="OS2D.eval"):
    """Mirror of os2d/data/dataloader.py:26-84."""
    from .dataset import build_dataset_by_name

    datasets_val = []
    eval_scales = []
    if data_path:
        if len(cfg.eval.dataset_scales) == 1:
            scales = list(cfg.eval.dataset_scales) * len(cfg.eval.dataset_names)
            names = cfg.eval.dataset_names
        elif len(cfg.eval.dataset_names) == 1:
            names = list(cfg.eval.dataset_names) * len(cfg.eval.dataset_scales)
            scales = cfg.eval.dataset_scales
        else:
            names, scales = cfg.eval.dataset_names, cfg.eval.dataset_scales
        assert len(names) == len(scales)
        for name, scale in zip(names, scales):
            if name:
                datasets_val.append(
                    build_dataset_by_name(data_path, name, eval_scale=scale,
                                          cache_images=cfg.eval.cache_images,
                                          logger_prefix=logger_prefix)
                )
                eval_scales.append(scale)
    for d in datasets_for_eval:
        datasets_val.append(d)
        eval_scales.append(d.eval_scale)

    loaders = []
    for dataset, eval_scale in zip(datasets_val, eval_scales):
        evaluation_scale = eval_scale / dataset.image_size
        pyramid = [p * evaluation_scale for p in cfg.eval.scales_of_image_pyramid]
        loaders.append(
            DataloaderOneShotDetection(
                dataset=dataset, batch_size=cfg.eval.batch_size,
                img_normalization=img_normalization,
                gt_image_size=cfg.model.class_image_size,
                pyramid_scales_eval=pyramid, do_augmentation=False,
                class_shape_palette=(None if getattr(cfg.eval, "exact_class_shapes", False) else "default"),
                logger_prefix=logger_prefix,
            )
        )
    return loaders


def build_train_dataloader_from_config(cfg, img_normalization=None,
                                       dataset_train=None, data_path="",
                                       logger_prefix="OS2D.train"):
    """Mirror of os2d/data/dataloader.py:87-143."""
    from .dataset import build_dataset_by_name

    if dataset_train is None:
        assert data_path
        dataset_train = build_dataset_by_name(
            data_path, cfg.train.dataset_name, eval_scale=cfg.train.dataset_scale,
            cache_images=cfg.train.cache_images,
            no_image_reading=not cfg.train.do_training,
        )
    random_crop_size = FeatureMapSize(
        w=cfg.train.augment.train_patch_width, h=cfg.train.augment.train_patch_height
    )
    evaluation_scale = dataset_train.eval_scale / dataset_train.image_size
    pyramid = [p * evaluation_scale for p in cfg.eval.scales_of_image_pyramid]

    # train batches need ONE class-image shape so the jitted train step keeps a
    # single signature; default: square class_image_size canvas (the reference
    # resizes aspect-preserved to the same area, dataloader.py:357-385)
    square = FeatureMapSize(
        w=cfg.model.class_image_size, h=cfg.model.class_image_size
    )
    dataloader = DataloaderOneShotDetection(
        dataset=dataset_train, batch_size=cfg.train.batch_size,
        class_batch_size=cfg.train.class_batch_size,
        class_shape_palette=[(square.w, square.h)],
        images_uint8=True,
        img_normalization=img_normalization,
        random_flip_batches=cfg.train.augment.random_flip_batches,
        random_crop_size=random_crop_size, random_crop_scale=evaluation_scale,
        jitter_aspect_ratio=cfg.train.augment.jitter_aspect_ratio,
        scale_jitter=cfg.train.augment.scale_jitter,
        min_box_coverage=cfg.train.augment.min_box_coverage,
        random_color_distortion=cfg.train.augment.random_color_distortion,
        random_crop_class_images=cfg.train.augment.random_crop_class_images,
        gt_image_size=cfg.model.class_image_size, pyramid_scales_eval=pyramid,
        do_augmentation=True,
        mine_extra_class_images=cfg.train.augment.mine_extra_class_images,
        logger_prefix=logger_prefix,
    )
    subsets = (
        [dataset_train.copy_subset(cfg.eval.train_subset_for_eval_size)]
        if cfg.eval.train_subset_for_eval_size > 0
        else []
    )
    return dataloader, subsets

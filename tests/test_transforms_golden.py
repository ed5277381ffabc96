"""Golden tests: host-side image/box transforms vs the executed reference."""

import random

import numpy as np
import torch
from PIL import Image

from reference_oracle import import_reference

import_reference()

from os2d.structures import transforms as ref_T  # noqa: E402
from os2d.structures.bounding_box import BoxList  # noqa: E402
from os2d.structures.feature_map import FeatureMapSize as RefFMS  # noqa: E402
from os2d.structures.transforms import TransformList as RefTransformList  # noqa: E402

from os2d_tpu.data import transforms as my_T  # noqa: E402
from os2d_tpu.structures.feature_map import FeatureMapSize  # noqa: E402
from os2d_tpu.structures.host_boxes import HostBoxes, TransformList  # noqa: E402


def make_image_and_boxes(rng, w=200, h=150, n=4):
    img = Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))
    x1 = rng.uniform(0, w * 0.6, n)
    y1 = rng.uniform(0, h * 0.6, n)
    bw = rng.uniform(10, w * 0.3, n)
    bh = rng.uniform(10, h * 0.3, n)
    boxes = np.stack([x1, y1, x1 + bw, y1 + bh], 1).astype(np.float32)
    return img, boxes


def test_transpose_matches_reference():
    rng = np.random.RandomState(0)
    img, boxes = make_image_and_boxes(rng)
    for hflip, vflip in [(True, False), (False, True), (True, True)]:
        ref_bl = BoxList(torch.as_tensor(boxes), RefFMS(w=200, h=150))
        ref_tl = RefTransformList()
        ref_img, ref_boxes = ref_T.transpose(
            img, hflip=hflip, vflip=vflip, boxes=ref_bl, transform_list=ref_tl
        )
        my_bl = HostBoxes(boxes, FeatureMapSize(w=200, h=150))
        my_tl = TransformList()
        my_img, my_boxes = my_T.transpose(
            img, hflip=hflip, vflip=vflip, boxes=my_bl, transform_list=my_tl
        )
        np.testing.assert_allclose(
            my_boxes.bbox_xyxy, ref_boxes.bbox_xyxy.numpy(), atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(my_img), np.asarray(ref_img))
        # inverse round-trips
        inv = my_tl(my_boxes)
        np.testing.assert_allclose(inv.bbox_xyxy, boxes, atol=1e-4)


def test_resize_matches_reference():
    rng = np.random.RandomState(1)
    img, boxes = make_image_and_boxes(rng)
    ref_bl = BoxList(torch.as_tensor(boxes), RefFMS(w=200, h=150))
    ref_tl = RefTransformList()
    ref_img, ref_boxes = ref_T.resize(
        img, target_size=RefFMS(w=120, h=90), boxes=ref_bl, transform_list=ref_tl
    )
    my_bl = HostBoxes(boxes, FeatureMapSize(w=200, h=150))
    my_tl = TransformList()
    my_img, my_boxes = my_T.resize(
        img, target_size=FeatureMapSize(w=120, h=90), boxes=my_bl,
        transform_list=my_tl,
    )
    np.testing.assert_allclose(
        my_boxes.bbox_xyxy, ref_boxes.bbox_xyxy.numpy(), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(my_img), np.asarray(ref_img))
    assert my_tl.as_scale_xy() is not None  # pure scaling inverse

    # scalar longer-side form
    ref_img2, _ = ref_T.resize(img, target_size=100)
    my_img2, _ = my_T.resize(img, target_size=100)
    assert my_img2.size == ref_img2.size


def test_random_crop_matches_reference_with_same_seed():
    rng = np.random.RandomState(2)
    img, boxes = make_image_and_boxes(rng, w=300, h=240)

    random.seed(1234)
    ref_bl = BoxList(torch.as_tensor(boxes), RefFMS(w=300, h=240))
    ref_tl = RefTransformList()
    ref_img, ref_boxes, ref_cut, ref_diff = ref_T.crop(
        img, random_crop_size=RefFMS(w=100, h=100), random_crop_scale=1.0,
        scale_jitter=0.8, jitter_aspect_ratio=0.9, min_box_coverage=0.5,
        boxes=ref_bl, transform_list=ref_tl,
    )

    random.seed(1234)
    my_bl = HostBoxes(boxes, FeatureMapSize(w=300, h=240))
    my_tl = TransformList()
    my_img, my_boxes, my_cut, my_diff = my_T.crop(
        img, random_crop_size=FeatureMapSize(w=100, h=100), random_crop_scale=1.0,
        scale_jitter=0.8, jitter_aspect_ratio=0.9, min_box_coverage=0.5,
        boxes=my_bl, transform_list=my_tl,
    )
    np.testing.assert_allclose(
        my_boxes.bbox_xyxy, ref_boxes.bbox_xyxy.numpy(), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(my_img), np.asarray(ref_img))
    np.testing.assert_array_equal(my_cut, ref_cut.numpy())
    np.testing.assert_array_equal(my_diff, ref_diff.numpy())
    # the recorded inverse maps cropped boxes back to original coordinates
    back_my = my_tl(my_boxes)
    back_ref = ref_tl(ref_boxes)
    np.testing.assert_allclose(
        back_my.bbox_xyxy, back_ref.bbox_xyxy.numpy(), atol=1e-4
    )


def test_mined_crop_with_padding_matches_reference():
    rng = np.random.RandomState(3)
    img, boxes = make_image_and_boxes(rng, w=200, h=150)
    # a crop that juts out beyond the right/bottom edge -> padding path
    crop_pos = np.array([[120.0, 80.0, 260.0, 200.0]], np.float32)

    ref_bl = BoxList(torch.as_tensor(boxes), RefFMS(w=200, h=150))
    ref_img, ref_boxes, _, _ = ref_T.crop(
        img,
        crop_position=BoxList(torch.as_tensor(crop_pos), RefFMS(w=200, h=150)),
        boxes=ref_bl,
    )
    my_bl = HostBoxes(boxes, FeatureMapSize(w=200, h=150))
    my_img, my_boxes, _, _ = my_T.crop(
        img,
        crop_position=HostBoxes(crop_pos, FeatureMapSize(w=200, h=150)),
        boxes=my_bl,
    )
    assert my_img.size == ref_img.size
    np.testing.assert_array_equal(np.asarray(my_img), np.asarray(ref_img))
    np.testing.assert_allclose(
        my_boxes.bbox_xyxy, ref_boxes.bbox_xyxy.numpy(), atol=1e-4
    )

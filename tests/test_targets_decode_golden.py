"""Golden tests: target encoding / remapping / pyramid decoding vs the
executed reference Os2dBoxCoder."""

import numpy as np
import jax.numpy as jnp
import torch

from reference_oracle import import_reference

import_reference()

from os2d.modeling.box_coder import Os2dBoxCoder, BoxGridGenerator  # noqa: E402
from os2d.structures.bounding_box import BoxList  # noqa: E402
from os2d.structures.feature_map import FeatureMapSize as RefFMS  # noqa: E402

from os2d_tpu.structures.feature_map import (  # noqa: E402
    FeatureMapSize,
    feature_map_size_for_image,
)
from os2d_tpu.engine.targets import (  # noqa: E402
    encode_targets_single_image,
    remap_targets,
)
from os2d_tpu.engine.decode import (  # noqa: E402
    decode_pyramid,
    default_boxes_for_image_size,
)

G_PAD = 8


def make_box_coder():
    def get_fm_size(img_size):
        fm = feature_map_size_for_image(FeatureMapSize(w=img_size.w, h=img_size.h))
        return RefFMS(w=fm.w, h=fm.h)

    return Os2dBoxCoder(
        positive_iou_threshold=0.5,
        negative_iou_threshold=0.1,
        remap_classification_targets_iou_pos=0.8,
        remap_classification_targets_iou_neg=0.4,
        output_box_grid_generator=BoxGridGenerator(
            box_size=RefFMS(w=240, h=240), box_stride=RefFMS(w=16, h=16)
        ),
        function_get_feature_map_size=get_fm_size,
        do_nms_across_classes=False,
    )


def random_gt(rng, n, img_w, img_h, num_labels):
    x1 = rng.uniform(0, img_w * 0.7, n)
    y1 = rng.uniform(0, img_h * 0.7, n)
    w = rng.uniform(30, img_w * 0.5, n)
    h = rng.uniform(30, img_h * 0.5, n)
    boxes = np.stack([x1, y1, np.minimum(x1 + w, img_w), np.minimum(y1 + h, img_h)], 1)
    labels = rng.randint(0, num_labels, n)
    difficult = rng.rand(n) < 0.3
    return boxes.astype(np.float32), labels.astype(np.int64), difficult


def pad_gt(boxes, labels, difficult):
    n = len(boxes)
    pb = np.zeros((G_PAD, 4), np.float32)
    pl = np.full((G_PAD,), -1, np.int32)
    pd = np.zeros((G_PAD,), bool)
    pv = np.zeros((G_PAD,), bool)
    pb[:n] = boxes
    pl[:n] = labels
    pd[:n] = difficult
    pv[:n] = True
    return pb, pl, pd, pv


def test_encode_targets_matches_reference():
    rng = np.random.RandomState(17)
    img_w, img_h, num_labels = 640, 480, 5
    boxes, labels, difficult = random_gt(rng, 6, img_w, img_h, num_labels)

    coder = make_box_coder()
    bl = BoxList(torch.as_tensor(boxes), RefFMS(w=img_w, h=img_h))
    bl.add_field("labels", torch.as_tensor(labels))
    bl.add_field("difficult", torch.as_tensor(difficult))
    want_loc, want_cls = coder.encode(bl, RefFMS(w=img_w, h=img_h), num_labels)

    pb, pl, pd, pv = pad_gt(boxes, labels, difficult)
    d_boxes = default_boxes_for_image_size(FeatureMapSize(w=img_w, h=img_h))
    got_loc, got_cls = encode_targets_single_image(
        jnp.asarray(pb), jnp.asarray(pl), jnp.asarray(pd), jnp.asarray(pv),
        d_boxes, num_labels,
    )
    np.testing.assert_array_equal(np.asarray(got_cls), want_cls.numpy())
    np.testing.assert_allclose(
        np.asarray(got_loc), want_loc.numpy(), rtol=1e-4, atol=1e-4
    )


def test_encode_targets_no_gt_label():
    # labels with no GT must produce all-zero targets (reference :383-385)
    rng = np.random.RandomState(3)
    boxes, labels, difficult = random_gt(rng, 2, 320, 320, 2)
    labels[:] = 0
    pb, pl, pd, pv = pad_gt(boxes, labels, difficult)
    d_boxes = default_boxes_for_image_size(FeatureMapSize(w=320, h=320))
    loc, cls = encode_targets_single_image(
        jnp.asarray(pb), jnp.asarray(pl), jnp.asarray(pd), jnp.asarray(pv), d_boxes, 3
    )
    assert np.all(np.asarray(cls[1]) == 0) and np.all(np.asarray(cls[2]) == 0)
    assert np.all(np.asarray(loc[1]) == 0)


def test_remap_targets_matches_reference():
    rng = np.random.RandomState(23)
    img_w, img_h, num_labels, b = 320, 256, 3, 2
    fm = feature_map_size_for_image(FeatureMapSize(w=img_w, h=img_h))
    a = fm.w * fm.h

    loc_scores = (rng.randn(b, num_labels, 4, a) * 0.5).astype(np.float32)
    coder = make_box_coder()

    batch_boxes = []
    padded = []
    for i in range(b):
        boxes, labels, difficult = random_gt(rng, 4, img_w, img_h, num_labels)
        bl = BoxList(torch.as_tensor(boxes), RefFMS(w=img_w, h=img_h))
        bl.add_field("labels", torch.as_tensor(labels))
        bl.add_field("difficult", torch.as_tensor(difficult))
        batch_boxes.append(bl)
        padded.append(pad_gt(boxes, labels, difficult))

    want_cls, want_iou_a, want_iou_c = coder.remap_anchor_targets(
        torch.as_tensor(loc_scores),
        [RefFMS(w=img_w, h=img_h)] * b,
        None,
        batch_boxes,
    )

    d_boxes = default_boxes_for_image_size(FeatureMapSize(w=img_w, h=img_h))
    got_cls, got_iou_a, got_iou_c = remap_targets(
        jnp.asarray(loc_scores),
        jnp.asarray(np.stack([p[0] for p in padded])),
        jnp.asarray(np.stack([p[1] for p in padded])),
        jnp.asarray(np.stack([p[2] for p in padded])),
        jnp.asarray(np.stack([p[3] for p in padded])),
        d_boxes,
    )
    np.testing.assert_array_equal(np.asarray(got_cls), want_cls.numpy())
    np.testing.assert_allclose(np.asarray(got_iou_a), want_iou_a.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_iou_c), want_iou_c.numpy(), rtol=1e-4, atol=1e-4)


def test_decode_pyramid_matches_reference():
    rng = np.random.RandomState(31)
    num_labels = 3
    orig_w, orig_h = 800, 600
    level_sizes = [(400, 300), (640, 480)]

    coder = make_box_coder()
    loc_pyr_t, cls_pyr_t = [], []
    loc_pyr_j, cls_pyr_j = [], []
    inverse_transforms = []
    img_sizes = []
    inverse_scales = []
    for (w, h) in level_sizes:
        fm = feature_map_size_for_image(FeatureMapSize(w=w, h=h))
        a = fm.w * fm.h
        loc = (rng.randn(num_labels, 4, a) * 0.3).astype(np.float32)
        cls = rng.uniform(-1, 1, (num_labels, a)).astype(np.float32)
        loc_pyr_t.append(torch.as_tensor(loc))
        cls_pyr_t.append(torch.as_tensor(cls))
        loc_pyr_j.append(jnp.asarray(loc))
        cls_pyr_j.append(jnp.asarray(cls))
        img_sizes.append(FeatureMapSize(w=w, h=h))
        inverse_scales.append((orig_w / w, orig_h / h))
        inverse_transforms.append(
            lambda bl, tw=orig_w, th=orig_h: bl.resize(RefFMS(w=tw, h=th))
        )

    want = coder.decode_pyramid(
        loc_pyr_t,
        cls_pyr_t,
        [RefFMS(w=w, h=h) for (w, h) in level_sizes],
        class_ids=list(range(num_labels)),
        nms_score_threshold=0.2,
        nms_iou_threshold=0.3,
        inverse_box_transforms=inverse_transforms,
    )
    want_boxes = want.bbox_xyxy.numpy()
    want_scores = want.get_field("scores").numpy()
    want_labels = want.get_field("labels").numpy()

    out = decode_pyramid(
        loc_pyr_j,
        cls_pyr_j,
        img_sizes,
        inverse_scales,
        nms_iou_threshold=0.3,
        score_threshold=0.2,
        pre_top_k=10_000,
        top_k=512,
    )
    got_boxes = np.asarray(out["boxes"])
    got_scores = np.asarray(out["scores"])
    got_valid = np.asarray(out["valid"])

    for label in range(num_labels):
        w_mask = want_labels == label
        wb = want_boxes[w_mask]
        ws = want_scores[w_mask]
        order = np.argsort(-ws, kind="stable")
        wb, ws = wb[order], ws[order]

        gb = got_boxes[label][got_valid[label]]
        gs = got_scores[label][got_valid[label]]
        assert len(gb) == len(wb), f"label {label}: {len(gb)} vs {len(wb)} survivors"
        np.testing.assert_allclose(gs, ws, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(gb, wb, rtol=1e-3, atol=1e-2)

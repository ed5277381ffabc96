"""Golden test: VOC mAP port vs the executed reference voc_eval."""

import numpy as np
import torch

from reference_oracle import import_reference

import_reference()

from os2d.data.voc_eval import do_voc_evaluation as ref_voc_eval  # noqa: E402
from os2d.structures.bounding_box import BoxList  # noqa: E402
from os2d.structures.feature_map import FeatureMapSize as RefFMS  # noqa: E402

from os2d_tpu.data.voc_eval import do_voc_evaluation  # noqa: E402


def random_scene(rng, num_labels, img_w, img_h, n_gt, n_pred):
    gx = rng.uniform(0, img_w * 0.8, n_gt)
    gy = rng.uniform(0, img_h * 0.8, n_gt)
    gw = rng.uniform(20, 100, n_gt)
    gh = rng.uniform(20, 100, n_gt)
    gt_boxes = np.stack([gx, gy, gx + gw, gy + gh], 1).astype(np.float32)
    gt_labels = rng.randint(0, num_labels, n_gt)
    gt_difficult = rng.rand(n_gt) < 0.25

    # predictions: jittered GT copies + random noise boxes
    pred_boxes, pred_labels, pred_scores = [], [], []
    for i in range(n_gt):
        for _ in range(rng.randint(0, 3)):
            jitter = rng.randn(4) * 8
            pred_boxes.append(gt_boxes[i] + jitter)
            pred_labels.append(gt_labels[i] if rng.rand() < 0.8 else rng.randint(num_labels))
            pred_scores.append(rng.rand())
    for _ in range(n_pred):
        x = rng.uniform(0, img_w * 0.8)
        y = rng.uniform(0, img_h * 0.8)
        pred_boxes.append([x, y, x + rng.uniform(10, 120), y + rng.uniform(10, 120)])
        pred_labels.append(rng.randint(num_labels))
        pred_scores.append(rng.rand())
    pred_boxes = np.asarray(pred_boxes, np.float32).reshape(-1, 4)
    return (
        gt_boxes,
        gt_labels,
        gt_difficult,
        pred_boxes,
        np.asarray(pred_labels),
        np.asarray(pred_scores, np.float32),
    )


def test_voc_eval_matches_reference():
    rng = np.random.RandomState(5)
    num_labels, img_w, img_h = 4, 640, 480
    n_images = 6

    ref_preds, ref_gts = [], []
    my_preds, my_gts = [], []
    for _ in range(n_images):
        gb, gl, gd, pb, pl, ps = random_scene(rng, num_labels, img_w, img_h, 5, 8)
        gt_bl = BoxList(torch.as_tensor(gb), RefFMS(w=img_w, h=img_h))
        gt_bl.add_field("labels", torch.as_tensor(gl))
        gt_bl.add_field("difficult", torch.as_tensor(gd))
        pred_bl = BoxList(torch.as_tensor(pb), RefFMS(w=img_w, h=img_h))
        pred_bl.add_field("labels", torch.as_tensor(pl))
        pred_bl.add_field("scores", torch.as_tensor(ps))
        ref_preds.append(pred_bl)
        ref_gts.append(gt_bl)
        my_preds.append(
            {"boxes": pb, "labels": pl, "scores": ps, "image_size": (img_w, img_h)}
        )
        my_gts.append(
            {"boxes": gb, "labels": gl, "difficult": gd, "image_size": (img_w, img_h)}
        )

    want = ref_voc_eval(ref_preds, ref_gts, iou_thresh=0.5, use_07_metric=False)
    got = do_voc_evaluation(my_preds, my_gts, iou_thresh=0.5, use_07_metric=False)

    np.testing.assert_allclose(got["map"], want["map"], rtol=1e-6)
    np.testing.assert_allclose(got["map_weighted"], want["map_weighted"], rtol=1e-6)
    np.testing.assert_allclose(got["ap_per_class"], want["ap_per_class"], rtol=1e-6)
    np.testing.assert_allclose(
        got["ap_joint_classes"], want["ap_joint_classes"], rtol=1e-6
    )
    np.testing.assert_allclose(got["recall"], want["recall"], rtol=1e-6)


def test_voc_eval_resizes_predictions():
    # predictions in a half-size frame must be upscaled before matching
    gt = [
        {
            "boxes": np.array([[100, 100, 200, 200]], np.float32),
            "labels": np.array([0]),
            "image_size": (400, 400),
        }
    ]
    pred = [
        {
            "boxes": np.array([[50, 50, 100, 100]], np.float32),
            "labels": np.array([0]),
            "scores": np.array([0.9], np.float32),
            "image_size": (200, 200),
        }
    ]
    res = do_voc_evaluation(pred, gt)
    assert res["map"] == 1.0


def test_voc_eval_07_metric():
    rng = np.random.RandomState(9)
    gb, gl, gd, pb, pl, ps = random_scene(rng, 3, 320, 320, 4, 6)
    ref_gt = BoxList(torch.as_tensor(gb), RefFMS(w=320, h=320))
    ref_gt.add_field("labels", torch.as_tensor(gl))
    ref_gt.add_field("difficult", torch.as_tensor(gd))
    ref_pred = BoxList(torch.as_tensor(pb), RefFMS(w=320, h=320))
    ref_pred.add_field("labels", torch.as_tensor(pl))
    ref_pred.add_field("scores", torch.as_tensor(ps))

    want = ref_voc_eval([ref_pred], [ref_gt], iou_thresh=0.5, use_07_metric=True)
    got = do_voc_evaluation(
        [{"boxes": pb, "labels": pl, "scores": ps}],
        [{"boxes": gb, "labels": gl, "difficult": gd}],
        iou_thresh=0.5,
        use_07_metric=True,
    )
    np.testing.assert_allclose(got["map"], want["map"], rtol=1e-6)

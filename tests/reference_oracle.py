"""Load the PyTorch reference (read-only, /root/reference) as a numeric oracle.

torchvision is not installed in this environment, so the handful of symbols
the reference imports from it are stubbed with literal ports of the
torchvision implementations (they are the public, well-known formulas). The
reference code itself is never copied — it is imported and EXECUTED to produce
golden tensors that the JAX implementation must match.
"""

import math
import sys
import types

import torch

REFERENCE_ROOT = "/root/reference"


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return

    tv = types.ModuleType("torchvision")
    tv.__path__ = []  # mark as package so submodule imports resolve via sys.modules
    ops = types.ModuleType("torchvision.ops")
    ops_boxes = types.ModuleType("torchvision.ops.boxes")
    models = types.ModuleType("torchvision.models")
    detection = types.ModuleType("torchvision.models.detection")
    det_utils = types.ModuleType("torchvision.models.detection._utils")
    resnet_mod = types.ModuleType("torchvision.models.resnet")

    # ---- torchvision.ops.boxes ----
    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def box_iou(boxes1, boxes2):
        area1 = box_area(boxes1)
        area2 = box_area(boxes2)
        lt = torch.max(boxes1[:, None, :2], boxes2[:, :2])
        rb = torch.min(boxes1[:, None, 2:], boxes2[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, :, 0] * wh[:, :, 1]
        return inter / (area1[:, None] + area2 - inter)

    def clip_boxes_to_image(boxes, size):
        h, w = size
        boxes = boxes.clone()
        boxes[:, 0].clamp_(min=0, max=w)
        boxes[:, 1].clamp_(min=0, max=h)
        boxes[:, 2].clamp_(min=0, max=w)
        boxes[:, 3].clamp_(min=0, max=h)
        return boxes

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True, stable=True)
        keep = []
        suppressed = torch.zeros(len(boxes), dtype=torch.bool)
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            iou = box_iou(boxes[i : i + 1], boxes)[0]
            suppressed |= iou > iou_threshold
            suppressed[i] = True
        return torch.tensor(keep, dtype=torch.long)

    ops_boxes.box_area = box_area
    ops_boxes.box_iou = box_iou
    ops_boxes.clip_boxes_to_image = clip_boxes_to_image
    ops_boxes.nms = nms
    ops.boxes = ops_boxes

    # ---- torchvision.models.detection._utils ----
    def encode_boxes(reference_boxes, proposals, weights):
        wx, wy, ww, wh = weights[0], weights[1], weights[2], weights[3]
        ex_w = proposals[:, 2] - proposals[:, 0]
        ex_h = proposals[:, 3] - proposals[:, 1]
        ex_cx = proposals[:, 0] + 0.5 * ex_w
        ex_cy = proposals[:, 1] + 0.5 * ex_h
        gt_w = reference_boxes[:, 2] - reference_boxes[:, 0]
        gt_h = reference_boxes[:, 3] - reference_boxes[:, 1]
        gt_cx = reference_boxes[:, 0] + 0.5 * gt_w
        gt_cy = reference_boxes[:, 1] + 0.5 * gt_h
        return torch.stack(
            [
                wx * (gt_cx - ex_cx) / ex_w,
                wy * (gt_cy - ex_cy) / ex_h,
                ww * torch.log(gt_w / ex_w),
                wh * torch.log(gt_h / ex_h),
            ],
            dim=1,
        )

    class BoxCoder:
        def __init__(self, weights, bbox_xform_clip=math.log(1000.0 / 16)):
            self.weights = weights
            self.bbox_xform_clip = bbox_xform_clip

        def decode_single(self, rel_codes, boxes):
            boxes = boxes.to(rel_codes.dtype)
            widths = boxes[:, 2] - boxes[:, 0]
            heights = boxes[:, 3] - boxes[:, 1]
            ctr_x = boxes[:, 0] + 0.5 * widths
            ctr_y = boxes[:, 1] + 0.5 * heights
            wx, wy, ww, wh = (
                self.weights[0],
                self.weights[1],
                self.weights[2],
                self.weights[3],
            )
            dx = rel_codes[:, 0] / wx
            dy = rel_codes[:, 1] / wy
            dw = torch.clamp(rel_codes[:, 2] / ww, max=self.bbox_xform_clip)
            dh = torch.clamp(rel_codes[:, 3] / wh, max=self.bbox_xform_clip)
            pred_ctr_x = dx * widths + ctr_x
            pred_ctr_y = dy * heights + ctr_y
            pred_w = torch.exp(dw) * widths
            pred_h = torch.exp(dh) * heights
            return torch.stack(
                [
                    pred_ctr_x - 0.5 * pred_w,
                    pred_ctr_y - 0.5 * pred_h,
                    pred_ctr_x + 0.5 * pred_w,
                    pred_ctr_y + 0.5 * pred_h,
                ],
                dim=1,
            )

    class Matcher:
        BELOW_LOW_THRESHOLD = -1
        BETWEEN_THRESHOLDS = -2

        def __init__(self, high_threshold, low_threshold, allow_low_quality_matches=False):
            assert low_threshold <= high_threshold
            self.high_threshold = high_threshold
            self.low_threshold = low_threshold
            self.allow_low_quality_matches = allow_low_quality_matches

        def __call__(self, match_quality_matrix):
            matched_vals, matches = match_quality_matrix.max(dim=0)
            below = matched_vals < self.low_threshold
            between = (matched_vals >= self.low_threshold) & (
                matched_vals < self.high_threshold
            )
            matches[below] = self.BELOW_LOW_THRESHOLD
            matches[between] = self.BETWEEN_THRESHOLDS
            return matches

    det_utils.encode_boxes = encode_boxes
    det_utils.BoxCoder = BoxCoder
    det_utils.Matcher = Matcher
    detection._utils = det_utils

    # ---- torchvision.models.resnet ----
    # ResNet must be nn.Module so ResNetFeatureExtractor (which subclasses it
    # and adopts a real module's __dict__) keeps Module attribute semantics.
    ResNet = torch.nn.Module

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision resnet factory not available in tests")

    resnet_mod.ResNet = ResNet
    resnet_mod.resnet50 = _unavailable
    resnet_mod.resnet101 = _unavailable
    models.resnet = resnet_mod
    models.detection = detection
    tv.ops = ops
    tv.models = models

    # ---- torchvision.transforms (ToTensor/Normalize/Compose/ColorJitter) ----
    transforms_mod = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class ToTensor:
        def __call__(self, img):
            import numpy as np

            arr = np.asarray(img, dtype=np.float32) / 255.0
            return torch.as_tensor(arr).permute(2, 0, 1)

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean = torch.as_tensor(mean).view(-1, 1, 1)
            self.std = torch.as_tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class ColorJitter:
        def __init__(self, **kwargs):
            raise NotImplementedError(
                "ColorJitter stub: color-distortion golden tests are not run"
            )

    transforms_mod.Compose = Compose
    transforms_mod.ToTensor = ToTensor
    transforms_mod.Normalize = Normalize
    transforms_mod.ColorJitter = ColorJitter
    tv.transforms = transforms_mod

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.transforms"] = transforms_mod
    sys.modules["torchvision.ops.boxes"] = ops_boxes
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.detection"] = detection
    sys.modules["torchvision.models.detection._utils"] = det_utils
    sys.modules["torchvision.models.resnet"] = resnet_mod


def _install_yacs_stub():
    """Minimal yacs.config.CfgNode so the reference config tree constructs."""
    if "yacs" in sys.modules:
        return

    class CfgNode(dict):
        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError as e:
                raise AttributeError(name) from e

        def __setattr__(self, name, value):
            self[name] = value

        def clone(self):
            import copy

            return copy.deepcopy(self)

        def freeze(self):
            return self

        def merge_from_list(self, opts):
            for k, v in zip(opts[0::2], opts[1::2]):
                node = self
                parts = k.split(".")
                for p in parts[:-1]:
                    node = node[p]
                node[parts[-1]] = v

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = yacs_config


def _patch_reference_for_pandas3():
    """The reference mutates DataFrame.to_numpy() views in place
    (os2d/data/dataset.py:687-693); pandas 3 returns read-only views. Wrap the
    dataframe so to_numpy hands out writable copies — behavior unchanged."""
    import pandas as pd

    import os2d.data.dataset as ref_dataset_mod

    class _WritableDF(pd.DataFrame):
        @property
        def _constructor(self):
            return _WritableDF

        def to_numpy(self, *args, **kwargs):
            arr = super().to_numpy(*args, **kwargs)
            if not arr.flags.writeable:
                arr = arr.copy()
            return arr

    original = ref_dataset_mod.DatasetOneShotDetection.get_boxes_from_image_dataframe

    def patched(image_data, image_size):
        return original(_WritableDF(image_data), image_size)

    ref_dataset_mod.DatasetOneShotDetection.get_boxes_from_image_dataframe = (
        staticmethod(patched)
    )


def import_reference():
    """Import the reference os2d package (with torchvision stubbed)."""
    _install_torchvision_stub()
    _install_yacs_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import os2d  # noqa: F401

    _patch_reference_for_pandas3()
    return sys.modules["os2d"]

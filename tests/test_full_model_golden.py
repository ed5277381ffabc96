"""ULTIMATE parity test: the full reference Os2dModel, executed end to end
with an injected torch backbone, vs this framework on the SAME weights.

The reference model normally pulls its ResNet from torchvision (absent here);
a structurally-identical torch backbone with torchvision names is injected via
monkeypatching build_feature_extractor's factory. Both frameworks then run the
identical random-init weights on the same image + query set, through backbone,
head, and pyramid decoding — detections must match.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from reference_oracle import import_reference

import_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_resnet import TorchResNetC4, _randomize_bn_stats  # noqa: E402

from os2d_tpu.engine.decode import decode_pyramid  # noqa: E402
from os2d_tpu.models import Os2dConfig, Os2dModel  # noqa: E402
from os2d_tpu.models.os2d import import_os2d_torch_checkpoint  # noqa: E402
from os2d_tpu.structures.feature_map import FeatureMapSize  # noqa: E402


class _TorchResNetFull(TorchResNetC4):
    """C4 backbone + dummy layer4/avgpool/fc so the reference's
    ResNetFeatureExtractor can delattr them (feature_extractor.py:42-55)."""

    def __init__(self, layers=(3, 4, 6)):
        super().__init__(layers=layers)
        self.layer4 = nn.Sequential()
        self.avgpool = nn.Identity()
        self.fc = nn.Identity()


def build_reference_model(seed: int = 3, backbone_arch: str = "resnet50",
                          simplify_affine: bool = False):
    """Reference Os2dModel with an injected torch backbone + nudged aligner.

    Shared by this module and the full-protocol parity test
    (test_full_protocol_golden.py). backbone_arch/simplify_affine select the
    paper's model variants (V2 = resnet50 + full affine, V1 = resnet101 +
    simplified affine; reference README.md:63-113)."""
    import os2d.modeling.feature_extractor as ref_fe
    from os2d.modeling.model import Os2dModel as RefOs2dModel

    torch.manual_seed(seed)
    rng = np.random.RandomState(seed)
    net = _TorchResNetFull(
        layers=(3, 4, 23) if backbone_arch == "resnet101" else (3, 4, 6))
    _randomize_bn_stats(net, rng)

    original = (ref_fe.resnet50, ref_fe.resnet101)
    ref_fe.resnet50 = lambda norm_layer=None: net
    ref_fe.resnet101 = lambda norm_layer=None: net
    try:
        import logging

        ref_model = RefOs2dModel(
            logger=logging.getLogger("ref"), is_cuda=False,
            backbone_arch=backbone_arch, merge_branch_parameters=True,
            use_inverse_geom_model=True, simplify_affine=simplify_affine,
        )
    finally:
        ref_fe.resnet50, ref_fe.resnet101 = original
    # give the aligner non-trivial weights (keep identity last layer + nudge)
    reg = ref_model.os2d_head_creator.aligner.parameter_regressor
    with torch.no_grad():
        for name, p in reg.named_parameters():
            if name.startswith("linear"):
                continue
            p.add_(torch.as_tensor(rng.randn(*p.shape).astype(np.float32)) * 0.05)
        reg.linear.weight.add_(
            torch.as_tensor(rng.randn(*reg.linear.weight.shape).astype(np.float32))
            * 0.001
        )
    ref_model.eval()
    return ref_model


@pytest.fixture(scope="module")
def reference_model():
    return build_reference_model()


def test_full_pipeline_detections_match(reference_model):
    """Same weights, same image, same queries -> same decoded detections."""
    from os2d.structures.feature_map import FeatureMapSize as RefFMS

    rng = np.random.RandomState(11)
    img_w, img_h = 256, 192
    image = rng.randn(1, 3, img_h, img_w).astype(np.float32)
    queries = [
        rng.randn(1, 3, 96, 96).astype(np.float32),
        rng.randn(1, 3, 80, 112).astype(np.float32),
    ]

    # ---- reference forward + decode ----
    with torch.no_grad():
        loc_t, cls_t, _, fm_size_t, _ = reference_model(
            images=torch.as_tensor(image),
            class_images=[torch.as_tensor(q[0]) for q in queries],
        )
    from os2d.modeling.box_coder import Os2dBoxCoder, BoxGridGenerator

    coder = Os2dBoxCoder(
        positive_iou_threshold=0.5, negative_iou_threshold=0.1,
        remap_classification_targets_iou_pos=0.8,
        remap_classification_targets_iou_neg=0.4,
        output_box_grid_generator=BoxGridGenerator(
            box_size=RefFMS(w=240, h=240), box_stride=RefFMS(w=16, h=16)
        ),
        function_get_feature_map_size=lambda s: fm_size_t,
        do_nms_across_classes=False,
    )
    ref_det = coder.decode_pyramid(
        [loc_t[0]], [cls_t[0]], [RefFMS(w=img_w, h=img_h)], [0, 1],
        nms_score_threshold=float("-inf"), nms_iou_threshold=0.3,
    )
    ref_boxes = ref_det.bbox_xyxy.numpy()
    ref_scores = ref_det.get_field("scores").numpy()
    ref_labels = ref_det.get_field("labels").numpy()

    # ---- this framework, same weights ----
    sd = {k: v.numpy() for k, v in reference_model.state_dict().items()}
    model_cfg = Os2dConfig(resample_precision="highest")
    params = import_os2d_torch_checkpoint(sd, model_cfg)
    model = Os2dModel(model_cfg)

    fm = model.extract_features(
        params, jnp.asarray(np.transpose(image, (0, 2, 3, 1)))
    )
    class_head = model.build_class_head_from_images(
        params, [jnp.asarray(np.transpose(q[0], (1, 2, 0))) for q in queries]
    )
    out = model.apply_head(params, fm, class_head)

    np.testing.assert_allclose(
        np.asarray(out["cls"][0]), cls_t[0].numpy(), rtol=2e-3, atol=2e-4
    )

    det = decode_pyramid(
        [out["loc"][0]], [out["cls"][0]],
        [FeatureMapSize(w=img_w, h=img_h)], [(1.0, 1.0)],
        nms_iou_threshold=0.3, pre_top_k=4096, top_k=256,
    )
    boxes = np.asarray(det["boxes"])
    scores = np.asarray(det["scores"])
    valid = np.asarray(det["valid"])

    for label in (0, 1):
        m = ref_labels == label
        want_b, want_s = ref_boxes[m], ref_scores[m]
        order = np.argsort(-want_s, kind="stable")
        want_b, want_s = want_b[order], want_s[order]
        got_b = boxes[label][valid[label]]
        got_s = scores[label][valid[label]]
        assert len(got_s) == len(want_s), (label, len(got_s), len(want_s))
        np.testing.assert_allclose(got_s, want_s, rtol=1e-3, atol=5e-4)
        np.testing.assert_allclose(got_b, want_b, rtol=1e-2, atol=0.5)

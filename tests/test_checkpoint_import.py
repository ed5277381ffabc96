"""Checkpoint import: reference state_dict layout -> JAX params pytree."""

import numpy as np
import torch

from reference_oracle import import_reference

import_reference()

from os2d.modeling.head import TransformationNet  # noqa: E402

from test_resnet import TorchResNetC4, _randomize_bn_stats  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from os2d_tpu.models import Os2dConfig  # noqa: E402
from os2d_tpu.models.os2d import (  # noqa: E402
    import_os2d_torch_checkpoint,
    import_weakalign_checkpoint,
)
from os2d_tpu.models.resnet import resnet_c4_forward  # noqa: E402
from os2d_tpu.models.transform_net import transform_net_forward  # noqa: E402


def build_reference_like_state_dict(rng):
    """Assemble a state dict with the reference Os2dModel's module paths
    (net_feature_maps.*, net_label_features.net_class_features.*,
    os2d_head_creator.aligner.parameter_regressor.*)."""
    torch.manual_seed(0)
    backbone = TorchResNetC4()
    _randomize_bn_stats(backbone, rng)
    backbone.eval()
    tn = TransformationNet(output_dim=6, use_cuda=False)
    with torch.no_grad():
        for p in tn.parameters():
            p.add_(torch.as_tensor(rng.randn(*p.shape).astype(np.float32)) * 0.02)
    tn.eval()

    sd = {}
    for k, v in backbone.state_dict().items():
        sd["net_feature_maps." + k] = v.numpy()
        sd["net_label_features.net_class_features." + k] = v.numpy()
    for k, v in tn.state_dict().items():
        sd["os2d_head_creator.aligner.parameter_regressor." + k] = v.numpy()
    return backbone, tn, sd


def test_import_os2d_checkpoint_reproduces_torch_forward():
    rng = np.random.RandomState(13)
    backbone, tn, sd = build_reference_like_state_dict(rng)

    params = import_os2d_torch_checkpoint(sd, Os2dConfig())
    assert "label_backbone" not in params  # merged branches share one subtree

    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = backbone(torch.as_tensor(x)).numpy()
    got = np.asarray(
        resnet_c4_forward(params["backbone"], jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    )
    np.testing.assert_allclose(
        np.transpose(got, (0, 3, 1, 2)), want, rtol=1e-3, atol=1e-3
    )

    corr = rng.randn(2, 225, 5, 5).astype(np.float32)
    with torch.no_grad():
        want_t = tn(torch.as_tensor(corr)).numpy()
    got_t = np.asarray(
        transform_net_forward(
            params["transform_net"], jnp.asarray(np.transpose(corr, (0, 2, 3, 1)))
        )
    )
    np.testing.assert_allclose(
        np.transpose(got_t, (0, 3, 1, 2)), want_t, rtol=1e-3, atol=1e-4
    )


def test_import_weakalign_regressor():
    """weakalign format: FeatureRegression.* with the conv-ified linear layer
    (os2d/modeling/model.py:415-426)."""
    rng = np.random.RandomState(3)
    tn = TransformationNet(output_dim=6, use_cuda=False)
    with torch.no_grad():
        for p in tn.parameters():
            p.add_(torch.as_tensor(rng.randn(*p.shape).astype(np.float32)) * 0.02)
    sd = {}
    for k, v in tn.state_dict().items():
        if k == "linear.weight":
            # weakalign stores the last layer as a linear [out, 64*5*5]
            v = v.reshape(v.shape[0], -1)
        sd["FeatureRegression." + k] = v.numpy()

    import jax

    params = import_weakalign_checkpoint(sd, Os2dConfig(), key=jax.random.PRNGKey(0))
    corr = rng.randn(1, 225, 4, 4).astype(np.float32)
    tn.eval()
    with torch.no_grad():
        want = tn(torch.as_tensor(corr)).numpy()
    got = np.asarray(
        transform_net_forward(
            params["transform_net"], jnp.asarray(np.transpose(corr, (0, 2, 3, 1)))
        )
    )
    np.testing.assert_allclose(
        np.transpose(got, (0, 3, 1, 2)), want, rtol=1e-3, atol=1e-4
    )


def test_foreign_format_converters():
    """caffe2-cirtorch / cirtorch / maskrcnn name maps -> loadable backbone."""
    from os2d_tpu.models.converters import convert_any_backbone
    from os2d_tpu.models.resnet import import_torch_resnet_state_dict

    rng = np.random.RandomState(0)
    torch.manual_seed(1)
    backbone = TorchResNetC4()
    backbone.eval()
    tv_sd = {k: v.numpy() for k, v in backbone.state_dict().items()}

    # build foreign-format dicts by inverse renaming
    inv_caffe2 = {"conv1.": "0.", "bn1.": "1.", "layer1.": "4.",
                  "layer2.": "5.", "layer3.": "6."}
    caffe2_sd = {}
    cirtorch_sd = {}
    mask_sd = {}
    for k, v in tv_sd.items():
        for tv_p, c2_p in inv_caffe2.items():
            if k.startswith(tv_p):
                caffe2_sd[c2_p + k[len(tv_p):]] = v
                cirtorch_sd["features." + c2_p + k[len(tv_p):]] = v
                stem = "stem." if tv_p in ("conv1.", "bn1.") else ""
                mask_sd["module.backbone.body." + stem + k] = v

    for foreign in (caffe2_sd, {"state_dict": cirtorch_sd}, {"model": mask_sd}):
        converted = convert_any_backbone(foreign)
        params = import_torch_resnet_state_dict(converted, "resnet50")
        x = rng.randn(1, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            want = backbone(torch.as_tensor(x)).numpy()
        got = np.asarray(
            resnet_c4_forward(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        )
        np.testing.assert_allclose(
            np.transpose(got, (0, 3, 1, 2)), want, rtol=1e-3, atol=1e-3
        )


def test_load_checkpoint_file_cascade(tmp_path):
    """The reference loader cascade: full checkpoint / weakalign / plain
    backbone state dicts all load through load_checkpoint_file."""
    import jax
    from os2d_tpu.models.os2d import load_checkpoint_file

    rng = np.random.RandomState(5)
    backbone, tn, full_sd = build_reference_like_state_dict(rng)

    # (1) full checkpoint with "net"
    p1 = str(tmp_path / "full.pth")
    torch.save({"net": {k: torch.as_tensor(v) for k, v in full_sd.items()},
                "optimizer": {"dummy": 1}}, p1)
    params, opt = load_checkpoint_file(p1, Os2dConfig())
    assert opt == {"dummy": 1}
    assert "transform_net" in params

    # (3) bare Os2dModel state dict
    p3 = str(tmp_path / "bare.pth")
    torch.save({k: torch.as_tensor(v) for k, v in full_sd.items()}, p3)
    params3, _ = load_checkpoint_file(p3, Os2dConfig())
    np.testing.assert_array_equal(
        np.asarray(params3["backbone"]["conv1"]), np.asarray(params["backbone"]["conv1"])
    )

    # (4) plain torchvision resnet state dict -> backbone-only init
    p4 = str(tmp_path / "resnet.pth")
    torch.save(backbone.state_dict(), p4)
    params4, _ = load_checkpoint_file(p4, Os2dConfig(),
                                      key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(params4["backbone"]["conv1"]), np.asarray(params["backbone"]["conv1"])
    )
    # transform net fell back to fresh init (identity bias)
    lb = np.asarray(params4["transform_net"]["linear"]["b"])
    np.testing.assert_allclose(lb, [1, 0, 0, 0, 1, 0])

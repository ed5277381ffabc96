"""Golden tests: JAX head pipeline vs the executed PyTorch reference."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from reference_oracle import import_reference

import_reference()

from os2d.modeling.head import (  # noqa: E402
    Os2dAlignment,
    Os2dHeadCreator,
    TransformationNet,
    build_os2d_head_creator,
)
from os2d.structures.feature_map import FeatureMapSize as RefFMS  # noqa: E402

from os2d_tpu.models.transform_net import (  # noqa: E402
    import_torch_transform_net_state_dict,
    transform_net_forward,
)
from os2d_tpu.models.head import build_class_head, head_forward  # noqa: E402

RNG = np.random.RandomState(7)


def _randomize_transform_net(tn, rng, identity_last=False):
    """Give the reference TransformationNet non-trivial weights + BN stats."""
    with torch.no_grad():
        for name, p in tn.named_parameters():
            if identity_last and name.startswith("linear"):
                continue  # keep the identity init
            p.add_(torch.as_tensor(rng.randn(*p.shape).astype(np.float32)) * 0.05)
        for m in tn.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.as_tensor(rng.randn(*m.running_mean.shape).astype(np.float32))
                    * 0.1
                )
                m.running_var.copy_(
                    torch.as_tensor(
                        np.abs(rng.randn(*m.running_var.shape)).astype(np.float32)
                    )
                    + 0.5
                )


def test_transform_net_forward_matches_reference():
    tn = TransformationNet(output_dim=6, use_cuda=False)
    _randomize_transform_net(tn, RNG)
    tn.eval()

    corr = RNG.randn(4, 225, 6, 7).astype(np.float32)
    with torch.no_grad():
        want = tn(torch.as_tensor(corr)).numpy()  # [N, 6, H, W]

    params = import_torch_transform_net_state_dict(
        {k: v.numpy() for k, v in tn.state_dict().items()}
    )
    got = np.asarray(
        transform_net_forward(params, jnp.asarray(np.transpose(corr, (0, 2, 3, 1))))
    )
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize(
    "simple_affine,inverse", [(False, True), (False, False), (True, True)]
)
def test_full_head_matches_reference(simple_affine, inverse):
    """End-to-end head: correlation -> alignment -> resample -> loc encoding."""
    rng = np.random.RandomState(3)
    b, c, hi, wi, f = 2, 3, 6, 7, 32

    head_creator = build_os2d_head_creator(
        do_simple_affine=simple_affine,
        is_cuda=False,
        use_inverse_geom_model=inverse,
        feature_map_stride=RefFMS(w=16, h=16),
        feature_map_receptive_field=RefFMS(w=16, h=16),
    )
    _randomize_transform_net(
        head_creator.aligner.parameter_regressor, rng, identity_last=True
    )
    # nudge the last layer slightly off identity so grids are non-trivial
    with torch.no_grad():
        lin = head_creator.aligner.parameter_regressor.linear
        lin.weight.add_(
            torch.as_tensor(rng.randn(*lin.weight.shape).astype(np.float32)) * 0.001
        )
    head_creator.eval()

    # class feature maps of different sizes (list of [1, F, h, w])
    class_fm_sizes = [(15, 15), (12, 18), (20, 9)]
    class_fms_t = [
        torch.as_tensor(rng.randn(1, f, h, w).astype(np.float32))
        for (h, w) in class_fm_sizes
    ]
    feature_maps_t = torch.as_tensor(rng.randn(b, f, hi, wi).astype(np.float32))

    with torch.no_grad():
        ref_head = head_creator.create_os2d_head(class_fms_t)
        loc_t, cls_t, cls_det_t, corners_t = ref_head(feature_maps_t)

    # JAX side
    params = import_torch_transform_net_state_dict(
        {
            k: v.numpy()
            for k, v in head_creator.aligner.parameter_regressor.state_dict().items()
        }
    )
    class_fms_j = [np.transpose(t.numpy()[0], (1, 2, 0)) for t in class_fms_t]
    class_head = build_class_head([jnp.asarray(x) for x in class_fms_j])
    out = head_forward(
        params,
        jnp.asarray(np.transpose(feature_maps_t.numpy(), (0, 2, 3, 1))),
        class_head,
        simple_affine=simple_affine,
        use_inverse_geom_model=inverse,
        train_mode=False,
    )

    # reference output shapes: loc [B, C, 4, H, W], cls [B, C, 1, H, W],
    # corners [B, C, 8, H, W]
    want_cls = cls_t.numpy().reshape(b, c, -1)
    got_cls = np.asarray(out["cls"])
    np.testing.assert_allclose(got_cls, want_cls, rtol=1e-3, atol=2e-4)

    want_loc = loc_t.numpy().reshape(b, c, 4, -1)
    got_loc = np.asarray(out["loc"])
    np.testing.assert_allclose(got_loc, want_loc, rtol=1e-3, atol=5e-4)

    want_corners = corners_t.numpy().reshape(b, c, 8, -1)
    got_corners = np.asarray(out["corners"])
    np.testing.assert_allclose(got_corners, want_corners, rtol=1e-3, atol=5e-3)


def test_head_train_mode_detached_equals_eval_values():
    rng = np.random.RandomState(5)
    b, c, hi, wi, f = 1, 2, 5, 5, 16
    from os2d_tpu.models.transform_net import init_transform_net_params
    import jax

    params = init_transform_net_params(jax.random.PRNGKey(0), 6)
    class_fms = [jnp.asarray(rng.randn(9, 11, f).astype(np.float32)) for _ in range(c)]
    class_head = build_class_head(class_fms)
    fm = jnp.asarray(rng.randn(b, hi, wi, f).astype(np.float32))

    out_train = head_forward(params, fm, class_head, train_mode=True)
    out_eval = head_forward(params, fm, class_head, train_mode=False)
    np.testing.assert_allclose(
        np.asarray(out_train["cls_detached"]),
        np.asarray(out_eval["cls"]),
        rtol=1e-5,
        atol=1e-6,
    )

"""TransformationNet: the weakalign-style affine-parameter regressor.

Functional NHWC port of the reference TransformationNet
(os2d/modeling/head.py:604-661): [ReLU -> L2-norm(channels)] ->
Conv7x7(225->128)+BN+ReLU -> Conv5x5(128->64)+BN+ReLU -> Conv5x5(64->out),
all convs padded to preserve spatial size; the final layer is zero-init with
an identity-transform bias. BatchNorm runs frozen (inference form) — the
reference training recipe freezes these BNs too (train.model.freeze_bn_transform).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.geometry import l2_normalize_channels

BN_EPS = 1e-5

KERNEL_SIZES = (7, 5)
CHANNELS = (128, 64)
INPUT_DIM = 15 * 15


def _conv(x, w, b, padding, dtype=None):
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.astype(jnp.float32) + b.astype(jnp.float32)


def _bn(x, p):
    inv = lax.rsqrt(p["var"].astype(jnp.float32) + BN_EPS)
    scale = p["scale"].astype(jnp.float32) * inv
    bias = p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * scale
    return x.astype(jnp.float32) * scale + bias


def transform_net_forward(params, corr_maps_nhwc, compute_dtype=jnp.float32):
    """corr maps [N, H, W, 225] -> transform params [N, H, W, output_dim].

    Accepts either raw params (conv + frozen BN) or params produced by
    fold_batchnorm_transform_net (BN absorbed into the conv, "bn*" absent).
    """
    x = l2_normalize_channels(jax.nn.relu(corr_maps_nhwc), eps=1e-6, axis=-1)
    x = _conv(x, params["conv0"]["w"], params["conv0"]["b"], 3, compute_dtype)
    x = jax.nn.relu(_bn(x, params["bn0"]) if "bn0" in params else x)
    x = _conv(x, params["conv1"]["w"], params["conv1"]["b"], 2, compute_dtype)
    x = jax.nn.relu(_bn(x, params["bn1"]) if "bn1" in params else x)
    x = _conv(x, params["linear"]["w"], params["linear"]["b"], 2, compute_dtype)
    return x


def fold_batchnorm_transform_net(params):
    """Inference-only transform: fold the two frozen BNs into their convs.

    BN(conv(x, W) + b) = conv(x, W*f) + (b*f + bias - mean*f), so both the
    conv bias and the BN affine collapse into one bias. The "bn*" keys are
    dropped; transform_net_forward detects that and skips the BN stage.
    """
    out = {"linear": params["linear"]}
    for name, bn_name in (("conv0", "bn0"), ("conv1", "bn1")):
        conv = params[name]
        bn = params[bn_name]
        f = bn["scale"].astype(jnp.float32) * lax.rsqrt(
            bn["var"].astype(jnp.float32) + BN_EPS
        )
        out[name] = {
            "w": conv["w"].astype(jnp.float32) * f,
            "b": conv["b"].astype(jnp.float32) * f
            + bn["bias"].astype(jnp.float32)
            - bn["mean"].astype(jnp.float32) * f,
        }
    return out


def init_transform_net_params(key, output_dim: int = 6):
    """Init matching the reference: torch-default conv init for the trunk,
    zero weights + identity bias for the final layer
    (os2d/modeling/head.py:631-642)."""

    def torch_conv_init(k, kh, kw, cin, cout):
        # torch nn.Conv2d default: kaiming_uniform_(a=sqrt(5)) on weight,
        # uniform bias bound 1/sqrt(fan_in)
        fan_in = kh * kw * cin
        gain = math.sqrt(2.0 / (1 + 5.0))
        bound_w = gain * math.sqrt(3.0 / fan_in)
        kw_, kb_ = jax.random.split(k)
        w = jax.random.uniform(kw_, (kh, kw, cin, cout), jnp.float32, -bound_w, bound_w)
        bound_b = 1.0 / math.sqrt(fan_in)
        b = jax.random.uniform(kb_, (cout,), jnp.float32, -bound_b, bound_b)
        return {"w": w, "b": b}

    def bn_params(c):
        return {
            "scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32),
        }

    k0, k1 = jax.random.split(key)
    params = {
        "conv0": torch_conv_init(k0, 7, 7, INPUT_DIM, CHANNELS[0]),
        "bn0": bn_params(CHANNELS[0]),
        "conv1": torch_conv_init(k1, 5, 5, CHANNELS[0], CHANNELS[1]),
        "bn1": bn_params(CHANNELS[1]),
    }
    lw = jnp.zeros((5, 5, CHANNELS[1], output_dim), jnp.float32)
    lb = jnp.zeros((output_dim,), jnp.float32)
    if output_dim == 6:
        lb = lb.at[0].set(1.0).at[4].set(1.0)
    elif output_dim == 4:
        lb = lb.at[0].set(1.0).at[2].set(1.0)
    params["linear"] = {"w": lw, "b": lb}
    return params


def import_torch_transform_net_state_dict(sd, prefix: str = ""):
    """Map the reference TransformationNet state_dict onto the param pytree.

    Reference module layout (os2d/modeling/head.py:608-629): conv.0 / conv.1
    (BN) / conv.3 / conv.4 (BN) / linear (ReLU at conv.2/conv.5 has no params).
    """
    import numpy as np

    def t(w):
        return jnp.asarray(np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0))))

    def arr(k):
        return jnp.asarray(np.asarray(sd[prefix + k]))

    def bn(base):
        return {
            "scale": arr(base + ".weight"),
            "bias": arr(base + ".bias"),
            "mean": arr(base + ".running_mean"),
            "var": arr(base + ".running_var"),
        }

    return {
        "conv0": {"w": t(sd[prefix + "conv.0.weight"]), "b": arr("conv.0.bias")},
        "bn0": bn("conv.1"),
        "conv1": {"w": t(sd[prefix + "conv.3.weight"]), "b": arr("conv.3.bias")},
        "bn1": bn("conv.4"),
        "linear": {"w": t(sd[prefix + "linear.weight"]), "b": arr("linear.bias")},
    }

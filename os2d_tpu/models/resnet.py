"""Functional ResNet50/101-C4 feature extractor (NHWC, frozen normalization).

TPU-native rebuild of the reference backbone
(os2d/modeling/feature_extractor.py:23-130): torchvision ResNet v1.5
bottlenecks (stride on the 3x3 conv), stem + layer1..3, C4 output with
1024 channels at stride 16. The params are a plain pytree (nested dicts /
lists) so the forward is a pure function usable under jit/vmap/pjit and
torch checkpoints map 1:1 onto it.

Normalization: BatchNorm runs in inference form (running stats) — the
reference freezes BN during OS2D training as well
(os2d/modeling/model.py:159-160, train.model.freeze_bn). GroupNorm(32) is
supported as the reference's alternative (feature_extractor.py:96-105).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# number of bottleneck blocks per layer, through layer3 (C4)
RESNET_DEPTHS = {
    "resnet50": (3, 4, 6),
    "resnet101": (3, 4, 23),
}

GROUPNORM_NUMGROUPS = 32
BN_EPS = 1e-5


def _conv(x, w, stride=1, padding=0, dtype=None):
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _norm(x, p):
    """Frozen BatchNorm (has running stats) or GroupNorm (no stats)."""
    if "mean" in p:
        inv = lax.rsqrt(p["var"].astype(jnp.float32) + BN_EPS)
        scale = p["scale"].astype(jnp.float32) * inv
        bias = p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * scale
        return x.astype(jnp.float32) * scale + bias
    # GroupNorm(32) over channels, eps as torch default 1e-5
    n, h, w, c = x.shape
    g = GROUPNORM_NUMGROUPS
    xg = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + BN_EPS)
    return xg.reshape(n, h, w, c) * p["scale"] + p["bias"]


def _bottleneck(x, p, stride, dtype):
    out = _conv(x, p["conv1"], 1, 0, dtype)
    out = jax.nn.relu(_norm(out, p["bn1"]))
    out = _conv(out, p["conv2"], stride, 1, dtype)
    out = jax.nn.relu(_norm(out, p["bn2"]))
    out = _conv(out, p["conv3"], 1, 0, dtype)
    out = _norm(out, p["bn3"])
    if "downsample_conv" in p:
        identity = _norm(_conv(x, p["downsample_conv"], stride, 0, dtype), p["downsample_bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def resnet_c4_forward(params, images_nhwc, compute_dtype=jnp.float32):
    """images [N, H, W, 3] (already normalized) -> C4 features [N, H/16, W/16, 1024]."""
    x = _conv(images_nhwc, params["conv1"], 2, 3, compute_dtype)
    x = jax.nn.relu(_norm(x, params["bn1"]))
    # maxpool 3x3 stride 2 pad 1 (pads with -inf, as torch)
    x = lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    strides = (1, 2, 2)
    for layer, stride in zip(("layer1", "layer2", "layer3"), strides):
        for i, block in enumerate(params[layer]):
            x = _bottleneck(x, block, stride if i == 0 else 1, compute_dtype)
    return x


def _norm_params(c, use_group_norm):
    p = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    if not use_group_norm:
        p["mean"] = jnp.zeros((c,), jnp.float32)
        p["var"] = jnp.ones((c,), jnp.float32)
    return p


def _he_conv(key, kh, kw, cin, cout):
    # torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
    fan_out = kh * kw * cout
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)


def init_resnet_c4_params(key, arch: str = "resnet50", use_group_norm: bool = False):
    depths = RESNET_DEPTHS[arch]
    keys = iter(jax.random.split(key, 4 + sum(depths) * 4))
    params = {
        "conv1": _he_conv(next(keys), 7, 7, 3, 64),
        "bn1": _norm_params(64, use_group_norm),
    }
    cin = 64
    for li, (blocks, width) in enumerate(zip(depths, (64, 128, 256))):
        layer = []
        cout = width * 4
        for bi in range(blocks):
            p = {
                "conv1": _he_conv(next(keys), 1, 1, cin, width),
                "bn1": _norm_params(width, use_group_norm),
                "conv2": _he_conv(next(keys), 3, 3, width, width),
                "bn2": _norm_params(width, use_group_norm),
                "conv3": _he_conv(next(keys), 1, 1, width, cout),
                "bn3": _norm_params(cout, use_group_norm),
            }
            if bi == 0:
                p["downsample_conv"] = _he_conv(next(keys), 1, 1, cin, cout)
                p["downsample_bn"] = _norm_params(cout, use_group_norm)
            layer.append(p)
            cin = cout
        params[f"layer{li + 1}"] = layer
    return params


def _t(w):
    """torch conv weight OIHW -> HWIO."""
    import numpy as np

    return jnp.asarray(np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0))))


def _import_norm(sd, prefix, use_group_norm):
    import numpy as np

    p = {
        "scale": jnp.asarray(np.asarray(sd[prefix + ".weight"])),
        "bias": jnp.asarray(np.asarray(sd[prefix + ".bias"])),
    }
    if not use_group_norm:
        p["mean"] = jnp.asarray(np.asarray(sd[prefix + ".running_mean"]))
        p["var"] = jnp.asarray(np.asarray(sd[prefix + ".running_var"]))
    return p


def import_torch_resnet_state_dict(sd, arch: str = "resnet50",
                                   use_group_norm: bool = False, prefix: str = ""):
    """Map a torchvision-format ResNet state_dict onto the C4 param pytree.

    Accepts the key layout produced by torchvision resnet50/101 (and hence by
    the reference's checkpoints; see os2d/modeling/model.py:290-386 for the
    loader cascade this plugs into). `sd` values may be torch tensors or numpy
    arrays; extra keys (fc.*, layer4.*) are ignored.
    """
    depths = RESNET_DEPTHS[arch]
    g = lambda k: sd[prefix + k]
    params = {
        "conv1": _t(g("conv1.weight")),
        "bn1": _import_norm(sd, prefix + "bn1", use_group_norm),
    }
    for li, blocks in enumerate(depths, start=1):
        layer = []
        for bi in range(blocks):
            base = f"layer{li}.{bi}."
            p = {}
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = _t(g(base + f"conv{ci}.weight"))
                p[f"bn{ci}"] = _import_norm(sd, prefix + base + f"bn{ci}", use_group_norm)
            if prefix + base + "downsample.0.weight" in sd:
                p["downsample_conv"] = _t(g(base + "downsample.0.weight"))
                p["downsample_bn"] = _import_norm(
                    sd, prefix + base + "downsample.1", use_group_norm
                )
            layer.append(p)
        params[f"layer{li}"] = layer
    return params

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

import jax
import jax.numpy as jnp
from jax import lax

# number of bottleneck blocks per layer, through layer3 (C4)
RESNET_DEPTHS = {
    "resnet50": (3, 4, 6),
    "resnet101": (3, 4, 23),
}

# full classifier depths (layer4 included) for ImageNet pretraining
RESNET_FULL_DEPTHS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
}

GROUPNORM_NUMGROUPS = 32
BN_EPS = 1e-5


def _conv(x, w, stride=1, padding=0, dtype=None):
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    # output follows the compute dtype (the following BN upcasts to fp32);
    # the MXU accumulates in fp32 internally for bf16 operands either way.
    # preferred_element_type is deliberately NOT forced to f32: that would
    # break the conv transpose rule under grad with bf16 operands.
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _norm(x, p):
    """Frozen BatchNorm (has running stats) or GroupNorm (no stats)."""
    if "folded_bias" in p:
        # BN already folded into the preceding conv's weights
        # (fold_batchnorm_c4): only the bias remains. Stays in the compute
        # dtype — this is what makes an end-to-end bf16 inference path
        # possible without fp32 cast traffic around every normalization.
        return x + p["folded_bias"].astype(x.dtype)
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


def _fold_conv_bn(conv_w, bn):
    """(conv, frozen-BN) -> (scaled conv, {'folded_bias': b}).

    BN(y) = y*f + (bias - mean*f) with f = scale*rsqrt(var+eps), so scaling
    the conv's output channels (last axis of HWIO) by f absorbs the multiply
    and leaves a pure bias add. GroupNorm params (no running stats) pass
    through untouched — GN depends on the batch activations and cannot fold.
    """
    if "mean" not in bn:
        return conv_w, bn
    f = bn["scale"].astype(jnp.float32) * lax.rsqrt(
        bn["var"].astype(jnp.float32) + BN_EPS
    )
    w = conv_w.astype(jnp.float32) * f
    bias = bn["bias"].astype(jnp.float32) - bn["mean"].astype(jnp.float32) * f
    return w, {"folded_bias": bias}


def fold_batchnorm_c4(params):
    """Inference-only transform: fold every frozen BN into its conv.

    Returns a new param pytree accepted by resnet_c4_forward; the BN slots
    become {'folded_bias': ...}. Cuts the per-block fp32 upcast + two
    elementwise passes, which is what lets compute_dtype=bfloat16 run the
    backbone without any fp32 traffic (ROADMAP item: BN folding at
    inference). Do NOT train on folded params: folding freezes the BN stats
    into the weights and changes the gradient parameterization.
    """
    out = {}
    w, b = _fold_conv_bn(params["conv1"], params["bn1"])
    out["conv1"], out["bn1"] = w, b
    for layer in ("layer1", "layer2", "layer3", "layer4"):
        if layer not in params:
            continue
        blocks = []
        for p in params[layer]:
            q = {}
            for ci in (1, 2, 3):
                q[f"conv{ci}"], q[f"bn{ci}"] = _fold_conv_bn(
                    p[f"conv{ci}"], p[f"bn{ci}"]
                )
            if "downsample_conv" in p:
                q["downsample_conv"], q["downsample_bn"] = _fold_conv_bn(
                    p["downsample_conv"], p["downsample_bn"]
                )
            blocks.append(q)
        out[layer] = blocks
    for k in ("fc",):
        if k in params:
            out[k] = params[k]
    return out


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


def resnet_classifier_forward(params, images_nhwc, compute_dtype=jnp.float32,
                              train_bn: bool = False, bn_momentum: float = 0.1):
    """Full ResNet classifier forward (for ImageNet pretraining).

    Returns (logits [N, num_classes], new_params): with train_bn=True,
    BatchNorm uses batch statistics and new_params carries updated running
    stats (torch momentum convention: run = (1-m)*run + m*batch).
    """
    new_params = params
    stats_updates = {}

    def norm(x, p, path):
        if not train_bn or "mean" not in p:
            return _norm(x, p)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        stats_updates[path] = (
            (1 - bn_momentum) * p["mean"] + bn_momentum * mean,
            (1 - bn_momentum) * p["var"] + bn_momentum * unbiased,
        )
        inv = lax.rsqrt(var + BN_EPS)
        return (xf - mean) * inv * p["scale"] + p["bias"]

    x = _conv(images_nhwc, params["conv1"], 2, 3, compute_dtype)
    x = jax.nn.relu(norm(x, params["bn1"], ("bn1",)))
    x = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    strides = (1, 2, 2, 2)
    for li, (layer, stride) in enumerate(
        zip(("layer1", "layer2", "layer3", "layer4"), strides)
    ):
        if layer not in params:
            break
        for i, block in enumerate(params[layer]):
            s = stride if i == 0 else 1
            out = _conv(x, block["conv1"], 1, 0, compute_dtype)
            out = jax.nn.relu(norm(out, block["bn1"], (layer, i, "bn1")))
            out = _conv(out, block["conv2"], s, 1, compute_dtype)
            out = jax.nn.relu(norm(out, block["bn2"], (layer, i, "bn2")))
            out = _conv(out, block["conv3"], 1, 0, compute_dtype)
            out = norm(out, block["bn3"], (layer, i, "bn3"))
            if "downsample_conv" in block:
                identity = norm(
                    _conv(x, block["downsample_conv"], s, 0, compute_dtype),
                    block["downsample_bn"],
                    (layer, i, "downsample_bn"),
                )
            else:
                identity = x
            x = jax.nn.relu(out + identity)
    x = jnp.mean(x, axis=(1, 2))  # global average pool
    logits = x @ params["fc"]["w"] + params["fc"]["b"]

    if train_bn and stats_updates:
        # tree_map rebuilds fresh containers around the same leaves, so the
        # in-place path edits below never alias the caller's tree
        new_params = jax.tree_util.tree_map(lambda a: a, params)
        for path, (m, v) in stats_updates.items():
            node = new_params
            for key in path[:-1]:
                node = node[key]
            node[path[-1]] = dict(node[path[-1]], mean=m, var=v)
    return logits, new_params


def init_resnet_classifier_params(key, arch: str = "resnet101",
                                  num_classes: int = 1000):
    """Full classifier params: C4 layers + layer4 + fc."""
    k1, k2, k3 = jax.random.split(key, 3)
    params = init_resnet_c4_params(k1, arch, use_group_norm=False)
    depths = RESNET_FULL_DEPTHS[arch]
    keys = iter(jax.random.split(k2, depths[3] * 4 + 1))
    layer4 = []
    cin = 1024
    for bi in range(depths[3]):
        p = {
            "conv1": _he_conv(next(keys), 1, 1, cin, 512),
            "bn1": _norm_params(512, False),
            "conv2": _he_conv(next(keys), 3, 3, 512, 512),
            "bn2": _norm_params(512, False),
            "conv3": _he_conv(next(keys), 1, 1, 512, 2048),
            "bn3": _norm_params(2048, False),
        }
        if bi == 0:
            p["downsample_conv"] = _he_conv(next(keys), 1, 1, cin, 2048)
            p["downsample_bn"] = _norm_params(2048, False)
        layer4.append(p)
        cin = 2048
    params["layer4"] = layer4
    bound = 1.0 / math.sqrt(2048)
    params["fc"] = {
        "w": jax.random.uniform(k3, (2048, num_classes), jnp.float32, -bound, bound),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    return params


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

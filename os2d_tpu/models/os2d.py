"""OS2D model facade: parameter pytree, forward functions, checkpoint import.

TPU rebuild of Os2dModel (os2d/modeling/model.py:123-386). The model is a pure
function over a params pytree:

  params = {
    "backbone":      ResNet-C4 params (input-image branch),
    "label_backbone": ResNet-C4 params for class images — PRESENT ONLY when
                      merge_branch_parameters=False. In the merged default
                      (reference model.py:144-146) the key is ABSENT and both
                      branches read "backbone": duplicating a shared subtree
                      under two pytree keys would make gradients SPLIT between
                      the copies instead of accumulating, silently un-sharing
                      the branches after one optimizer step.
    "transform_net":  TransformationNet params,
  }

Class heads are not stateful submodules (the reference's Os2dHead closures,
model.py:197-233): class features are a [C, 15, 15, F] array computed once and
passed around explicitly, so classes vmap/shard as a batch axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..structures.feature_map import FeatureMapSize, feature_map_size_for_image
from .head import ClassHead, build_class_head, head_forward
from .resnet import (
    import_torch_resnet_state_dict,
    init_resnet_c4_params,
    resnet_c4_forward,
)
from .transform_net import (
    import_torch_transform_net_state_dict,
    init_transform_net_params,
)

IMG_NORMALIZATION_MEAN = (0.485, 0.456, 0.406)
IMG_NORMALIZATION_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class Os2dConfig:
    """Static model configuration (mirrors cfg.model, os2d/config.py:14-29)."""

    backbone_arch: str = "resnet50"
    merge_branch_parameters: bool = True
    use_inverse_geom_model: bool = True
    use_simplified_affine_model: bool = False
    use_group_norm: bool = False
    class_image_size: int = 240
    normalization_mean: tuple = IMG_NORMALIZATION_MEAN
    normalization_std: tuple = IMG_NORMALIZATION_STD
    compute_dtype: str = "float32"
    resample_precision: str = "default"  # 'highest' = fp32-exact, slower;
    # 'default' (1-pass bf16 MXU) measured mAP-neutral vs 'high'
    # (tools/map_sensitivity.py round 2: dmAP +0.0000, score delta ~3e-4)
    corr_interior_first: bool = True  # emit the correlation tensor with the
    # pool-mask interior as a contiguous channel prefix (models/head.py
    # _interior_permutation): kills the strided interior-compaction relayout
    # before the resample (~200 ms/dispatch at C=1024, tools/profile_fused.py
    # r3); mAP-gated identical to the natural order (dmAP +0.0000, identical
    # detection deltas, tools/map_sensitivity.py r3)
    resample_t_chunk: int = 0  # template points per unrolled resample chunk;
    # 0 = measured heuristic (8 for class chunks <= 32, else 1 — the VPU
    # loop fusion at large C runs fastest at the smallest t granularity,
    # BENCH_NOTES r3)

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def init_os2d_params(key, config: Os2dConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    backbone = init_resnet_c4_params(k1, config.backbone_arch, config.use_group_norm)
    transform_net = init_transform_net_params(
        k3, 4 if config.use_simplified_affine_model else 6
    )
    params = {"backbone": backbone, "transform_net": transform_net}
    if not config.merge_branch_parameters:
        params["label_backbone"] = init_resnet_c4_params(
            k2, config.backbone_arch, config.use_group_norm
        )
    return params


def label_backbone_params(params):
    """The class-image branch's backbone: separate if present, else shared."""
    return params.get("label_backbone", params["backbone"])


def fold_inference_params(params):
    """Fold all frozen BatchNorms into their convs for inference.

    Returns a new params pytree with every BN absorbed into the preceding
    conv's weights (backbone, label backbone if separate, and the
    TransformationNet). The folded tree runs through the same forward
    functions, does strictly less work per layer, and — crucially — has no
    fp32 normalization islands, so compute_dtype=bfloat16 stays bf16
    end-to-end. Inference only: never feed folded params to the optimizer.
    """
    from .resnet import fold_batchnorm_c4
    from .transform_net import fold_batchnorm_transform_net

    out = dict(
        params,
        backbone=fold_batchnorm_c4(params["backbone"]),
        transform_net=fold_batchnorm_transform_net(params["transform_net"]),
    )
    if "label_backbone" in params:
        out["label_backbone"] = fold_batchnorm_c4(params["label_backbone"])
    return out


def normalize_images(images_nhwc, config: Os2dConfig):
    """Apply the dataset mean/std normalization to [0,1]-range NHWC images."""
    mean = jnp.asarray(config.normalization_mean, jnp.float32)
    std = jnp.asarray(config.normalization_std, jnp.float32)
    return (images_nhwc - mean) / std


class Os2dModel:
    """Convenience wrapper bundling config + jitted forward functions.

    All heavy lifting lives in pure functions; this class only caches jitted
    specializations. Safe to use from the eval/train engines and the API layer.
    """

    def __init__(self, config: Os2dConfig):
        self.config = config
        self._extract_jit = jax.jit(self._extract)
        self._extract_label_jit = jax.jit(self._extract_label)
        self._head_jit = jax.jit(self._head, static_argnames=("train_mode",))

    # ---- pure functions ----
    def _extract(self, params, images_nhwc):
        return resnet_c4_forward(params["backbone"], images_nhwc, self.config.dtype)

    def _extract_label(self, params, images_nhwc):
        return resnet_c4_forward(
            label_backbone_params(params), images_nhwc, self.config.dtype
        )

    def _head(self, params, feature_maps, class_head, train_mode: bool):
        from .head import QuantizedClassHead, dequantize_class_head

        if isinstance(class_head, QuantizedClassHead):
            # int8 chunk -> fp32 on device, INSIDE the jitted program: the
            # bank stays int8 in HBM, only the active chunk materializes fp32
            class_head = dequantize_class_head(class_head)
        return head_forward(
            params["transform_net"],
            feature_maps,
            class_head,
            simple_affine=self.config.use_simplified_affine_model,
            use_inverse_geom_model=self.config.use_inverse_geom_model,
            train_mode=train_mode,
            compute_dtype=self.config.dtype,
            resample_precision=self.config.resample_precision,
            corr_interior_first=self.config.corr_interior_first,
            resample_t_chunk=self.config.resample_t_chunk,
        )

    # ---- public API ----
    def extract_features(self, params, images_nhwc):
        """[B, H, W, 3] normalized images -> [B, H/16, W/16, 1024]."""
        return self._extract_jit(params, images_nhwc)

    def build_class_head_from_images(self, params, class_images) -> ClassHead:
        """Class images (list of [h, w, 3] normalized arrays, possibly of
        different sizes) -> ClassHead with [C, 15, 15, F] features.

        Images of identical shape are batched into one backbone call; jit
        compiles once per unique shape (shapes come from a small palette).
        """
        by_shape = {}
        for i, img in enumerate(class_images):
            by_shape.setdefault(tuple(img.shape), []).append(i)
        feats = [None] * len(class_images)
        for shape, idxs in by_shape.items():
            batch = jnp.stack([jnp.asarray(class_images[i]) for i in idxs])
            fm = self._extract_label_jit(params, batch)
            for j, i in enumerate(idxs):
                feats[i] = fm[j]
        return build_class_head(feats)

    def apply_head(self, params, feature_maps, class_head: ClassHead,
                   train_mode: bool = False):
        """Feature maps + class head -> dict(loc, cls, cls_detached, corners)."""
        return self._head_jit(params, feature_maps, class_head, train_mode=train_mode)

    def get_feature_map_size(self, img_size: FeatureMapSize) -> FeatureMapSize:
        """Static-arithmetic replacement of the reference's dummy-forward probe
        (os2d/modeling/model.py:98-120)."""
        return feature_map_size_for_image(img_size)


# ---------------------------------------------------------------------------
# Checkpoint import (released PyTorch checkpoints -> params pytree)
# ---------------------------------------------------------------------------

def import_os2d_torch_checkpoint(state_dict, config: Os2dConfig):
    """Map an Os2dModel state_dict ("net" entry of a reference checkpoint,
    os2d/utils/logger.py:137-160) onto the JAX params pytree.

    Reference module paths:
      net_feature_maps.*                         -> backbone
      net_label_features.net_class_features.*    -> label_backbone
      os2d_head_creator.aligner.parameter_regressor.* -> transform_net
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    backbone = import_torch_resnet_state_dict(
        sd, config.backbone_arch, config.use_group_norm, prefix="net_feature_maps."
    )
    transform_net = import_torch_transform_net_state_dict(
        sd, prefix="os2d_head_creator.aligner.parameter_regressor."
    )
    params = {"backbone": backbone, "transform_net": transform_net}
    if not config.merge_branch_parameters:
        params["label_backbone"] = import_torch_resnet_state_dict(
            sd, config.backbone_arch, config.use_group_norm,
            prefix="net_label_features.net_class_features.",
        )
    return params


def import_weakalign_checkpoint(state_dict, config: Os2dConfig,
                                params: Optional[dict] = None, key=None):
    """Init from a weakalign-format checkpoint (os2d/modeling/model.py:389-426):
    FeatureExtraction.model.* -> resnet names, FeatureRegression.* -> the affine
    regressor with linear.weight reshaped to a 5x5 conv."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    if params is None:
        params = init_os2d_params(
            key if key is not None else jax.random.PRNGKey(0), config
        )

    remap = {"conv1.": "FeatureExtraction.model.0.", "bn1.": "FeatureExtraction.model.1."}
    for idx in range(3):
        remap[f"layer1.{idx}."] = f"FeatureExtraction.model.4.{idx}."
    for idx in range(4):
        remap[f"layer2.{idx}."] = f"FeatureExtraction.model.5.{idx}."
    for idx in range(23):
        remap[f"layer3.{idx}."] = f"FeatureExtraction.model.6.{idx}."

    resnet_sd = {}
    for tgt, src in remap.items():
        for k in list(sd.keys()):
            if k.startswith(src):
                resnet_sd[tgt + k[len(src):]] = sd[k]
    try:
        backbone = import_torch_resnet_state_dict(
            resnet_sd, config.backbone_arch, config.use_group_norm
        )
        params = dict(params, backbone=backbone)
        if not config.merge_branch_parameters:
            params["label_backbone"] = backbone
    except KeyError:
        pass  # partial init: keep existing backbone where weakalign lacks layers

    reg_sd = {}
    for k in list(sd.keys()):
        if k.startswith("FeatureRegression."):
            v = sd[k]
            name = k[len("FeatureRegression."):]
            if name == "linear.weight":
                v = v.reshape(-1, 64, 5, 5)  # conv-ified linear (model.py:426)
            reg_sd[name] = v
    if reg_sd:
        params = dict(
            params, transform_net=import_torch_transform_net_state_dict(reg_sd)
        )
    return params


def load_checkpoint_file(path: str, config: Os2dConfig, params=None, key=None):
    """Load a torch-side checkpoint: the cascade of the reference loader
    (os2d/modeling/model.py:290-386):
      1. full checkpoint dict with "net" [+ "optimizer"];
      2. weakalign-format ("state_dict" with FeatureExtraction/FeatureRegression);
      3. full Os2dModel state_dict (net_feature_maps.* names);
      4. backbone-only init: plain torchvision ResNet names or any foreign
         format handled by models/converters (caffe2-cirtorch / cirtorch /
         maskrcnn-benchmark) — the rest of the model keeps `params` (or a
         fresh init).
    """
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(checkpoint, dict) and "net" in checkpoint:
        sd = checkpoint["net"]
        optimizer_state = checkpoint.get("optimizer")
        return import_os2d_torch_checkpoint(sd, config), optimizer_state
    if isinstance(checkpoint, dict) and "state_dict" in checkpoint and any(
        k.startswith("FeatureExtraction") for k in checkpoint["state_dict"]
    ):
        return (
            import_weakalign_checkpoint(checkpoint["state_dict"], config,
                                        params=params, key=key),
            None,
        )
    sd = checkpoint
    for nested in ("state_dict", "model"):
        if isinstance(sd, dict) and nested in sd and isinstance(sd[nested], dict):
            sd = sd[nested]
    if any(k.startswith("net_feature_maps.") for k in sd):
        return import_os2d_torch_checkpoint(sd, config), None

    # backbone-only init (step 4 of the reference cascade)
    from .converters import convert_any_backbone

    backbone_sd = convert_any_backbone(sd)
    backbone = import_torch_resnet_state_dict(
        backbone_sd, config.backbone_arch, config.use_group_norm
    )
    if params is None:
        params = init_os2d_params(
            key if key is not None else jax.random.PRNGKey(0), config
        )
    params = dict(params, backbone=backbone)
    if not config.merge_branch_parameters:
        params["label_backbone"] = backbone
    return params, None

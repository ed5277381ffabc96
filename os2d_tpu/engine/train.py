"""Training engine: fully-jitted train step + trainval loop.

TPU rebuild of os2d/engine/train.py:28-567. The reference's per-batch Python
sequence (forward -> host remap loops -> loss -> backward -> clip -> NaN dump)
compiles here into ONE XLA program per batch signature:
  encode targets (device, vmapped) -> forward (backbone + label branch + head)
  -> remap (device, vmapped) -> objective -> grads -> global-norm clip ->
  finite-guard (skip update on non-finite grad norm, the reference dumps a
  reproducer and skips, train.py:116-131) -> optax update.

Gradients flow through the label branch (fine-tune-features semantics,
model.py:259-269); class images come in as ONE batched array (the train
dataloader resizes them to a single palette shape), padded to a static class
count with padded rows excluded from the loss via ignore targets.
"""

from __future__ import annotations

import logging
import os
import math
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.head import ANCHOR_BOX, ANCHOR_STRIDE, build_class_head, head_forward
from ..models.os2d import label_backbone_params
from ..models.resnet import resnet_c4_forward
from ..structures.boxes import strided_anchor_grid
from ..structures.feature_map import FeatureMapSize, feature_map_size_for_image
from ..utils.logger import (
    add_to_meters_in_dict,
    checkpoint_model,
    init_log,
    log_meters,
    print_meters,
    time_since,
)
from .objective import ObjectiveConfig, compute_objective
from .optimization import get_learning_rate, set_learning_rate, setup_lr
from .targets import encode_targets_single_image, remap_targets


def default_boxes_for_size(img_size: FeatureMapSize):
    fm = feature_map_size_for_image(img_size)
    return strided_anchor_grid(
        fm.w, fm.h,
        float(ANCHOR_BOX.w), float(ANCHOR_BOX.h),
        float(ANCHOR_STRIDE.w), float(ANCHOR_STRIDE.h),
    )


class LazyMetrics:
    """Packed step metrics, materialized on FIRST access (one device->host
    transfer for all scalars). Mapping-like, so callers that read
    metrics["loss"] immediately keep working; callers that want to hide the
    per-step sync latency hold it un-read until the next step is dispatched
    (trainval_loop's one-behind pattern)."""

    def __init__(self, keys, vec):
        self._keys = list(keys)
        self._vec = vec
        self._vals = None

    def materialized(self):
        if self._vals is None:
            self._vals = {
                k: float(v) for k, v in zip(self._keys, np.asarray(self._vec))
            }
            self._vec = None
        return self._vals

    def __getitem__(self, k):
        return self.materialized()[k]

    def __iter__(self):
        return iter(self._keys)

    def __len__(self):
        return len(self._keys)

    def items(self):
        return self.materialized().items()

    def keys(self):
        return list(self._keys)


class TrainStep:
    """Caches jitted train-step specializations per batch signature.

    `__call__` dispatches ONE step; `multi` dispatches K stacked steps as a
    single `lax.scan` program (same per-step math), hiding the per-step
    host->device dispatch+sync latency — measured ~100-150 ms/step over the
    axon tunnel (BENCH_NOTES r2 training section)."""

    def __init__(self, model_cfg, objective_cfg: ObjectiveConfig, optimizer,
                 train_cfg):
        self.model_cfg = model_cfg
        self.objective_cfg = objective_cfg
        self.optimizer = optimizer
        self.train_cfg = train_cfg  # cfg.train node
        self._fn_cache = {}    # num_classes -> (raw_step, metric_keys)
        self._step_cache = {}  # signature -> jitted program

    def _get_fn(self, num_classes: int):
        if num_classes not in self._fn_cache:
            self._fn_cache[num_classes] = self._make_step(num_classes)
        return self._fn_cache[num_classes]

    def _make_step(self, num_classes: int):
        model_cfg = self.model_cfg
        obj_cfg = self.objective_cfg
        optimizer = self.optimizer
        tcfg = self.train_cfg
        train_features = bool(tcfg.model.train_features)
        train_transform_on_negs = bool(tcfg.model.train_transform_on_negs)
        max_grad_norm = float(tcfg.optim.max_grad_norm)
        pos_thr = float(tcfg.objective.positive_iou_threshold)
        neg_thr = float(tcfg.objective.negative_iou_threshold)
        remap_pos = float(tcfg.objective.remap_classification_targets_iou_pos)
        remap_neg = float(tcfg.objective.remap_classification_targets_iou_neg)

        def loss_fn(params, images, class_images, class_valid, gt_boxes,
                    gt_labels, gt_difficult, gt_valid, default_boxes):
            # uint8-over-the-wire batches: normalize on device (bit-equal
            # to the host ToTensor+Normalize path). A PackedYuv420 wire
            # decodes here, fused into the program preamble (direct to
            # float, like the eval path).
            mean = jnp.asarray(model_cfg.normalization_mean, jnp.float32)
            std = jnp.asarray(model_cfg.normalization_std, jnp.float32)

            def _norm(x):
                from ..ops.pixel_format import PackedYuv420, yuv420_to_rgb_f32

                if isinstance(x, PackedYuv420):
                    return (yuv420_to_rgb_f32(x.data, x.shape) / 255.0
                            - mean) / std
                if x.dtype == jnp.uint8:
                    return (x.astype(jnp.float32) / 255.0 - mean) / std
                return x

            images = _norm(images)
            class_images = _norm(class_images)
            fm = resnet_c4_forward(params["backbone"], images, model_cfg.dtype)
            class_fm = resnet_c4_forward(
                label_backbone_params(params), class_images, model_cfg.dtype
            )
            if not train_features:
                fm = jax.lax.stop_gradient(fm)
                class_fm = jax.lax.stop_gradient(class_fm)
            class_head = build_class_head(class_fm)

            out = head_forward(
                params["transform_net"], fm, class_head,
                simple_affine=model_cfg.use_simplified_affine_model,
                use_inverse_geom_model=model_cfg.use_inverse_geom_model,
                train_mode=True, compute_dtype=model_cfg.dtype,
                resample_precision=model_cfg.resample_precision,
                corr_interior_first=model_cfg.corr_interior_first,
                resample_t_chunk=model_cfg.resample_t_chunk,
            )

            # device-side target encoding (the reference encodes on host in the
            # dataloader, dataloader.py:599)
            loc_t, cls_t = jax.vmap(
                partial(
                    encode_targets_single_image,
                    num_labels=num_classes,
                    positive_iou_threshold=pos_thr,
                    negative_iou_threshold=neg_thr,
                ),
                in_axes=(0, 0, 0, 0, None),
            )(gt_boxes, gt_labels, gt_difficult, gt_valid, default_boxes)

            # post-forward remapping on the PREDICTED boxes (no grads)
            cls_remapped, ious_anchor, ious_corrected = remap_targets(
                jax.lax.stop_gradient(out["loc"]),
                gt_boxes, gt_labels, gt_difficult, gt_valid, default_boxes,
                remap_iou_pos=remap_pos, remap_iou_neg=remap_neg,
            )

            # padded class rows -> ignore everywhere
            cvalid = class_valid[None, :, None]
            cls_t = jnp.where(cvalid, cls_t, -1)
            cls_remapped = jnp.where(cvalid, cls_remapped, -1)

            losses, _ = compute_objective(
                obj_cfg,
                out["loc"], loc_t, out["cls"], cls_t,
                cls_targets_remapped=cls_remapped,
                cls_preds_for_neg=(
                    None if train_transform_on_negs else out["cls_detached"]
                ),
            )
            return losses["loss"], losses

        def step(params, opt_state, images, class_images, class_valid, gt_boxes,
                 gt_labels, gt_difficult, gt_valid, default_boxes):
            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, images, class_images, class_valid, gt_boxes, gt_labels,
                gt_difficult, gt_valid, default_boxes,
            )
            grad_norm = optax_global_norm(grads)
            # torch-style clip_grad_norm_
            scale = jnp.minimum(1.0, max_grad_norm / (grad_norm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

            finite = jnp.isfinite(grad_norm)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: jnp.where(finite, p + u, p), params, updates
            )
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state
            )
            metrics = {k: v for k, v in losses.items()}
            metrics["grad_norm"] = grad_norm
            # pack scalars into ONE vector: each dict leaf would otherwise
            # cost its own device->host transfer when the caller reads it
            # (~9 tunnel round-trips per step, measured >1 s/step over axon)
            keys = sorted(k for k in metrics if jnp.ndim(metrics[k]) == 0)
            if not metric_keys:
                metric_keys.extend(keys)
            return new_params, new_opt_state, jnp.stack(
                [metrics[k] for k in keys])

        metric_keys = []  # filled at trace time
        return step, metric_keys

    @staticmethod
    def _img_sig(images):
        # PackedYuv420 exposes the logical RGB shape; tag the wire format so
        # packed and plain programs never share a cache slot. The tag is a
        # two-valued wire-format flag, NOT type(images).__name__: numerically
        # identical np.ndarray / jax Array batches must share one compiled
        # slot (and one K-step dispatch group), wherever the array lives.
        from ..ops.pixel_format import PackedYuv420

        wire = "yuv420" if isinstance(images, PackedYuv420) else "rgb8"
        return (wire, tuple(images.shape))

    @staticmethod
    def _batch_args(batch_arrays):
        return (
            batch_arrays["images"], batch_arrays["class_images"],
            batch_arrays["class_valid"], batch_arrays["gt_boxes"],
            batch_arrays["gt_labels"], batch_arrays["gt_difficult"],
            batch_arrays["gt_valid"],
        )

    def __call__(self, params, opt_state, batch_arrays, num_classes):
        raw_step, metric_keys = self._get_fn(num_classes)
        key = (
            num_classes,
            self._img_sig(batch_arrays["images"]),
            batch_arrays["class_images"].shape,
            batch_arrays["gt_boxes"].shape,
        )
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(raw_step)
        new_params, new_opt_state, metric_vec = self._step_cache[key](
            params, opt_state, *self._batch_args(batch_arrays),
            batch_arrays["default_boxes"],
        )
        return new_params, new_opt_state, LazyMetrics(metric_keys, metric_vec)

    def multi(self, params, opt_state, stacked_arrays, num_classes):
        """K steps in ONE dispatch: every batch-dependent array in
        `stacked_arrays` carries a leading [K] axis (see
        stack_prepared_batches); default_boxes is shared (same image size
        across the group). Returns (params, opt_state, metric_keys,
        metric_vecs [K, M]) — per-step metrics identical to K sequential
        `__call__`s (the scan body IS the single-step function), with one
        device->host transfer for the whole group.

        Replaces the loop being outpaced at
        /root/reference/os2d/engine/train.py:462-541 (one dispatch+sync per
        step)."""
        raw_step, metric_keys = self._get_fn(num_classes)
        key = (
            "multi", num_classes,
            self._img_sig(stacked_arrays["images"]),
            stacked_arrays["class_images"].shape,
            stacked_arrays["gt_boxes"].shape,
        )
        if key not in self._step_cache:

            @jax.jit
            def multi_step(params, opt_state, images, class_images,
                           class_valid, gt_boxes, gt_labels, gt_difficult,
                           gt_valid, default_boxes):
                def body(carry, xs):
                    p, o = carry
                    new_p, new_o, vec = raw_step(p, o, *xs, default_boxes)
                    return (new_p, new_o), vec

                (params, opt_state), vecs = jax.lax.scan(
                    body, (params, opt_state),
                    (images, class_images, class_valid, gt_boxes, gt_labels,
                     gt_difficult, gt_valid),
                )
                return params, opt_state, vecs

            self._step_cache[key] = multi_step
        new_params, new_opt_state, metric_vecs = self._step_cache[key](
            params, opt_state, *self._batch_args(stacked_arrays),
            stacked_arrays["default_boxes"],
        )
        return new_params, new_opt_state, metric_keys, metric_vecs



def visualize_target_remapping_for_batch(batch_arrays, num_classes, params,
                                         model_cfg, train_cfg, out_dir,
                                         objective_cfg=None):
    """Host-side replay of the jitted step's target encode + remap for one
    batch, saved as per-(image, label) diagnostic figures (reference
    train.py:96-97 -> visualization.py:85-137). Debug-only: runs the forward
    un-jitted once. With `objective_cfg`, the figures include the anchor IoU
    maps, the per-anchor classification loss, and the loss gradients w.r.t.
    the score maps (with and without the transform detached) — the reference
    gets these via torch.autograd.grad; here a jax.grad of the objective
    w.r.t. the score tensors."""
    from ..utils.visualization import show_target_remapping

    mean = jnp.asarray(model_cfg.normalization_mean, jnp.float32)
    std = jnp.asarray(model_cfg.normalization_std, jnp.float32)
    batch_arrays = _decode_packed_images(batch_arrays)

    def _norm(x):
        if x.dtype == jnp.uint8:
            return (x.astype(jnp.float32) / 255.0 - mean) / std
        return x

    images_n = _norm(batch_arrays["images"])
    fm = resnet_c4_forward(params["backbone"], images_n, model_cfg.dtype)
    class_head = build_class_head(
        resnet_c4_forward(
            label_backbone_params(params), _norm(batch_arrays["class_images"]),
            model_cfg.dtype,
        )
    )
    out = head_forward(
        params["transform_net"], fm, class_head,
        simple_affine=model_cfg.use_simplified_affine_model,
        use_inverse_geom_model=model_cfg.use_inverse_geom_model,
        train_mode=True, compute_dtype=model_cfg.dtype,
        resample_precision=model_cfg.resample_precision,
        corr_interior_first=model_cfg.corr_interior_first,
        resample_t_chunk=model_cfg.resample_t_chunk,
    )
    obj = train_cfg.objective
    loc_t, cls_t = jax.vmap(
        partial(
            encode_targets_single_image,
            num_labels=num_classes,
            positive_iou_threshold=obj.positive_iou_threshold,
            negative_iou_threshold=obj.negative_iou_threshold,
        ),
        in_axes=(0, 0, 0, 0, None),
    )(batch_arrays["gt_boxes"], batch_arrays["gt_labels"],
      batch_arrays["gt_difficult"], batch_arrays["gt_valid"],
      batch_arrays["default_boxes"])
    cls_remapped, ious_anchor, ious_corrected = remap_targets(
        out["loc"], batch_arrays["gt_boxes"], batch_arrays["gt_labels"],
        batch_arrays["gt_difficult"], batch_arrays["gt_valid"],
        batch_arrays["default_boxes"],
        remap_iou_pos=obj.remap_classification_targets_iou_pos,
        remap_iou_neg=obj.remap_classification_targets_iou_neg,
    )

    loss_map = grad_map = grad_det_map = None
    if objective_cfg is not None:
        # gradients of the training loss w.r.t. the score maps, targets fixed
        # (reference visualization.py:92-93 via torch.autograd.grad)
        cvalid = batch_arrays["class_valid"][None, :, None]
        cls_t_m = jnp.where(cvalid, cls_t, -1)
        cls_remapped_m = jnp.where(cvalid, cls_remapped, -1)

        def _loss_of_scores(cls_scores, cls_scores_detached):
            losses, per_anchor = compute_objective(
                objective_cfg, out["loc"], loc_t, cls_scores, cls_t_m,
                cls_targets_remapped=cls_remapped_m,
                cls_preds_for_neg=cls_scores_detached,
                want_per_anchor=True,
            )
            return losses["loss"], per_anchor

        (_, per_anchor), (grad_map, grad_det_map) = jax.value_and_grad(
            _loss_of_scores, argnums=(0, 1), has_aux=True
        )(out["cls"], out["cls_detached"])
        loss_map = np.asarray(per_anchor["cls_loss"])
        grad_map = np.asarray(grad_map)
        grad_det_map = np.asarray(grad_det_map)

    fm_h, fm_w = fm.shape[1], fm.shape[2]
    os.makedirs(out_dir, exist_ok=True)
    class_valid = np.asarray(batch_arrays["class_valid"])
    cls_scores = np.asarray(out["cls"])
    cls_t = np.asarray(cls_t)
    cls_remapped = np.asarray(cls_remapped)
    ious_anchor = np.asarray(ious_anchor)
    ious_corrected = np.asarray(ious_corrected)
    saved = []

    def _fm(arr, i, l):
        return None if arr is None else arr[i, l].reshape(fm_h, fm_w)

    for i in range(cls_scores.shape[0]):
        for l in range(cls_scores.shape[1]):
            if not class_valid[l]:
                continue
            # only labels with a positive target somewhere are interesting
            if not (cls_t[i, l] == 1).any():
                continue
            saved.append(show_target_remapping(
                np.asarray(images_n[i]),
                cls_scores[i, l].reshape(fm_h, fm_w),
                cls_t[i, l].reshape(fm_h, fm_w),
                cls_remapped[i, l].reshape(fm_h, fm_w),
                ious_anchor=_fm(ious_anchor, i, l),
                ious_corrected=_fm(ious_corrected, i, l),
                loss_per_anchor=_fm(loss_map, i, l),
                grad_scores=_fm(grad_map, i, l),
                grad_scores_detached=_fm(grad_det_map, i, l),
                save_path=os.path.join(out_dir, f"remap_img{i}_lbl{l}.png"),
            ))
    return saved


def dump_nan_reproducer(dump_dir, batch_arrays, params, opt_state, num_classes,
                        extra=None):
    """Dump everything needed to replay a non-finite-gradient step.

    Parity with the reference's error_nan_appeared-<ts>.pth dump
    (os2d/engine/train.py:116-129): batch + weights + optimizer state + extras
    go to `error_nan_appeared-<ts>.pkl` as plain numpy trees. The reference
    also saves the gradient tensors; here gradients are recomputed exactly on
    reload (the dump holds params + the batch, and the jitted step is
    deterministic), which keeps the hot step free of a full-gradient
    device->host transfer. Reload with `load_nan_reproducer(path)`.
    """
    import datetime
    import pickle

    def _np(x):
        # multi-host: batch shards live on other hosts' devices; gather the
        # global value so the reproducer is complete (single-host: no-op)
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    to_np = lambda t: jax.tree_util.tree_map(_np, t)
    ts = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    # metrics are replicated, so in a multi-host run EVERY host reaches this
    # dump (which also keeps the allgather above collective-safe); a
    # per-process suffix keeps the (identical) dumps from clobbering
    # mid-write on shared storage
    proc = f"-p{jax.process_index()}" if jax.process_count() > 1 else ""
    path = os.path.join(dump_dir or ".", f"error_nan_appeared-{ts}{proc}.pkl")
    payload = {
        "batch_arrays": to_np(batch_arrays),
        "net": to_np(params),
        "optimizer": to_np(opt_state),
        "num_classes": int(num_classes),
        "extra": extra,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def load_nan_reproducer(path):
    """Load an error_nan_appeared dump back as device arrays.

    Returns a dict with 'batch_arrays', 'net', 'optimizer', 'num_classes';
    re-run the failing step with:
        d = load_nan_reproducer(path)
        train_step(d['net'], d['optimizer'], d['batch_arrays'], d['num_classes'])
    (matches the reference's reload snippet, os2d/engine/train.py:131-139).
    """
    import pickle

    with open(path, "rb") as f:
        payload = pickle.load(f)
    for k in ("batch_arrays", "net", "optimizer"):
        payload[k] = jax.tree_util.tree_map(jnp.asarray, payload[k])
    return payload


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def build_trainable_mask(params, train_cfg):
    """Pytree of bools: False for frozen leaves (freeze_transform /
    num_frozen_extractor_blocks, os2d/modeling/model.py:56-63)."""
    mask = jax.tree_util.tree_map(lambda _: True, params)
    if train_cfg.model.freeze_transform:
        mask["transform_net"] = jax.tree_util.tree_map(
            lambda _: False, params["transform_net"]
        )
    n_frozen = int(train_cfg.model.num_frozen_extractor_blocks)
    if n_frozen > 0:
        for branch in ("backbone", "label_backbone"):
            if branch not in params:
                continue
            remaining = n_frozen
            # block 1: conv1 + bn1
            if remaining > 0:
                mask[branch]["conv1"] = False
                mask[branch]["bn1"] = jax.tree_util.tree_map(
                    lambda _: False, params[branch]["bn1"]
                )
                remaining -= 1
            for layer in ("layer1", "layer2", "layer3"):
                for i, block in enumerate(params[branch][layer]):
                    if remaining > 0:
                        mask[branch][layer][i] = jax.tree_util.tree_map(
                            lambda _: False, block
                        )
                        remaining -= 1
    if not train_cfg.model.train_features:
        for branch in ("backbone", "label_backbone"):
            if branch in params:
                mask[branch] = jax.tree_util.tree_map(lambda _: False, params[branch])
    return mask


def pad_class_batch(class_images, num_real, pad_to):
    """Stack same-shape class images and pad to a static class count
    (dtype preserved: uint8 batches normalize on device in the step)."""
    arr = np.stack(class_images, 0)
    if arr.dtype != np.uint8:
        arr = arr.astype(np.float32)
    if num_real < pad_to:
        pad = np.zeros((pad_to - num_real,) + arr.shape[1:], arr.dtype)
        arr = np.concatenate([arr, pad], 0)
    valid = np.zeros((pad_to,), bool)
    valid[:num_real] = True
    return arr, valid


_lossy_wire_warned = False


def _warn_lossy_wire_once():
    """One-time attribution when "auto" resolves to the lossy yuv420 wire,
    so runs are attributable to their wire format from the log alone. The
    default is backed by the trained-dmAP gate (BENCH_NOTES r5: dmAP
    +0.0000 over 200 trained steps) and the full-protocol eval-detection
    equality (tests/test_pixel_format.py); pin
    cfg.tpu.upload_pixel_format="rgb8" for bit-exact reference numerics."""
    global _lossy_wire_warned
    if not _lossy_wire_warned:
        _lossy_wire_warned = True
        logging.getLogger("OS2D.train").info(
            "upload_pixel_format=auto -> yuv420 wire on this accelerator "
            "backend (lossy 4:2:0 chroma; trained-dmAP-gated, BENCH_NOTES "
            "r5). Pin cfg.tpu.upload_pixel_format='rgb8' for bit-exact "
            "uploads.")


def prepare_batch_arrays(batch, class_pad_multiple=4, gt_pad_to=None,
                         upload_streams=2, upload_serialize=False,
                         pixel_format="auto"):
    """Host batch dict (from the dataloader) -> static-shape device arrays.

    The three upload knobs are plain parameters wired from cfg.tpu by
    trainval_loop's `_prep` partial — this function reads NO environment
    variables (the reference hot path has none either,
    os2d/modeling/head.py:271-435; bench tools resolve their own env
    overrides and pass explicit values).

    upload_serialize (cfg.tpu.upload_serialize; default OFF) routes the
    dominant image upload through the one-in-flight transfer gate with a
    completion fence. Measured NEGATIVE as a default (BENCH_NOTES r3): the
    fence's readback round trip blocks the prefetcher thread's host prep,
    and K-step groups absorb upload contention under their long compute
    (K=8: 4.41 unfenced vs 2.65 fenced steps/s). Kept as an opt-in for
    tunnels where transfer contention dominates host-prep overlap.

    pixel_format (cfg.tpu.upload_pixel_format; default "auto") applies the
    YUV 4:2:0 wire format (ops/pixel_format.py) to the dominant batch-image
    upload: the wire payload halves and `images` comes back as a
    PackedYuv420 that the step/scan program decodes in its preamble
    (loss_fn._norm). Mesh paths decode up front instead
    (_decode_packed_images) because they shard the prepared arrays with
    explicit per-leaf specs.
    "auto" = yuv420 on accelerator backends, bit-exact rgb8 on CPU.
    """
    if pixel_format == "auto":
        import jax

        pixel_format = "rgb8" if jax.default_backend() == "cpu" else "yuv420"
        if pixel_format == "yuv420":
            _warn_lossy_wire_once()
    class_images = batch["class_images"]
    if class_images is None:
        # device-resident class cache (data/class_cache.py): resolve the
        # class tensor with an on-device gather+flip — nothing crosses the
        # wire but two small index vectors
        g = batch["class_gather"]
        c_real = len(g["class_ids"])
        c_pad = max(class_pad_multiple,
                    math.ceil(c_real / class_pad_multiple) * class_pad_multiple)
        class_arr = g["cache"].gather(
            g["class_ids"], g["method_idx"], g["hflip"], g["vflip"], c_pad)
        class_valid = np.zeros((c_pad,), bool)
        class_valid[:c_real] = True
    else:
        shapes = {im.shape for im in class_images}
        assert len(shapes) == 1, (
            "train batches need a single class-image shape; configure the "
            f"train dataloader with a one-entry class shape palette "
            f"(got {shapes})"
        )
        c_real = len(class_images)
        c_pad = max(class_pad_multiple,
                    math.ceil(c_real / class_pad_multiple) * class_pad_multiple)
        class_arr, class_valid = pad_class_batch(class_images, c_real, c_pad)

    img_size = batch["img_size"]
    from ..utils.upload import parallel_device_put

    def _upload_images(imgs):
        # the batch images are the step's dominant upload (~4.3 MB rgb8 /
        # ~2.2 MB yuv420 at the grozi recipe); upload_streams>1
        # (cfg.tpu.upload_streams, env OS2D_UPLOAD_STREAMS for the bench
        # tools) splits the put into parallel chunked transfers
        # (per-stream-limited tunnels, utils/upload.py)
        if not isinstance(imgs, np.ndarray):
            return jnp.asarray(imgs)
        if (pixel_format == "yuv420" and imgs.dtype == np.uint8
                and imgs.ndim == 4 and imgs.shape[-1] == 3
                and imgs.shape[1] % 2 == 0 and imgs.shape[2] % 2 == 0):
            from ..ops.pixel_format import PackedYuv420, rgb_to_yuv420

            packed = rgb_to_yuv420(imgs)
            wire = parallel_device_put(packed.data, streams=upload_streams,
                                       serialize=upload_serialize)
            # the wire stays PACKED until the step/scan program decodes it
            # in its preamble (loss_fn._norm). Design argument: an eager
            # decode dispatched here from the prefetcher thread would ride
            # the in-order TPU execution queue ahead of the previous
            # group's scan while depending on a still-in-flight transfer,
            # serializing upload behind compute. Measured (BENCH_NOTES r5
            # train-wire matrix): the eager form lost both adjacent K=8
            # pairs vs packed (3.06 vs 3.56, 4.79 vs 6.18 steps/s);
            # tools/bench_train.py OS2D_UPLOAD_PIXEL_FORMAT=yuv420_eager
            # reproduces the comparison.
            return PackedYuv420(wire, packed.shape)
        return parallel_device_put(imgs, streams=upload_streams,
                                   serialize=upload_serialize)

    arrays = {
        "images": _upload_images(batch["images"]),
        "class_images": jnp.asarray(class_arr),
        "class_valid": jnp.asarray(class_valid),
        "gt_boxes": jnp.asarray(batch["gt_boxes"]),
        "gt_labels": jnp.asarray(batch["gt_labels"]),
        "gt_difficult": jnp.asarray(batch["gt_difficult"]),
        "gt_valid": jnp.asarray(batch["gt_valid"]),
        "default_boxes": default_boxes_for_size(img_size),
    }
    return arrays, c_pad


def _decode_packed_images(arrays):
    """PackedYuv420 wire -> plain uint8 RGB images (no-op otherwise).

    Mesh paths shard the prepared arrays with explicit per-leaf specs
    (parallel/mesh.py), so the wire decodes up front there; single-chip
    paths keep the wire packed and decode inside the step program."""
    from ..ops.pixel_format import PackedYuv420, decode_wire_to_u8_device

    if isinstance(arrays.get("images"), PackedYuv420):
        arrays = dict(arrays,
                      images=decode_wire_to_u8_device(arrays["images"]))
    return arrays


def batch_signature(prepared):
    """Image/anchor shape signature of a prepared batch; only batches that
    agree here may share one multi-step dispatch group (the class and GT
    axes are padded to the group max by stack_prepared_batches, but the
    image shape fixes the compiled program's spatial dims)."""
    arrays, _ = prepared
    return (TrainStep._img_sig(arrays["images"]),
            arrays["class_images"].shape[1:],
            arrays["default_boxes"].shape)


def stack_prepared_batches(prepared_list):
    """[(arrays, c_pad), ...] (same image signature) -> (stacked arrays with
    a leading [K] axis, group c_pad) for TrainStep.multi.

    Batches may differ in their per-batch GT count and padded class count;
    both axes pad to the group max (gt_valid / class_valid already mask the
    pad rows, so the padded steps are bit-equal to their unpadded single
    dispatches). The per-batch arrays are already device-resident (uploaded
    by the prefetcher thread), so the stack is a cheap on-device concat.
    default_boxes is shared: equal image signature implies equal anchors."""
    arrays0, _ = prepared_list[0]
    assert all(batch_signature(p) == batch_signature(prepared_list[0])
               for p in prepared_list[1:]), (
        "grouped batches must share the image/anchor signature")
    c_pad = max(p[0]["class_images"].shape[0] for p in prepared_list)
    g_pad = max(p[0]["gt_boxes"].shape[1] for p in prepared_list)

    def pad_to(x, axis, size):
        if x.shape[axis] == size:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, size - x.shape[axis])
        # bool/int pads are zeros = invalid/ignored rows
        return jnp.pad(x, widths)

    gt_keys = ("gt_boxes", "gt_labels", "gt_difficult", "gt_valid")
    stacked = {}
    from ..ops.pixel_format import PackedYuv420

    for k in arrays0:
        if k == "default_boxes":
            stacked[k] = arrays0[k]
        elif k in ("class_images", "class_valid"):
            stacked[k] = jnp.stack(
                [pad_to(p[0][k], 0, c_pad) for p in prepared_list], 0)
        elif k in gt_keys:
            stacked[k] = jnp.stack(
                [pad_to(p[0][k], 1, g_pad) for p in prepared_list], 0)
        elif k == "images" and isinstance(arrays0[k], PackedYuv420):
            # stack the flat wire buffers; lax.scan slices one [n] wire per
            # step and the pytree aux carries the per-step logical shape
            stacked[k] = PackedYuv420(
                jnp.stack([p[0][k].data for p in prepared_list], 0),
                arrays0[k].shape)
        else:
            stacked[k] = jnp.stack([p[0][k] for p in prepared_list], 0)
    return stacked, c_pad


class BatchPrefetcher:
    """Background-thread batch preparation: overlaps the host-side PIL
    augmentation pipeline (the reference's CPU bottleneck, SURVEY.md §3.1)
    with the device step. The reference loads synchronously
    (os2d/engine/train.py:481-483); here get_batch(i) runs one step ahead.

    Kept in Python threads rather than native code deliberately: PIL releases
    the GIL for decode/resize, so a thread already overlaps fully with the
    jitted device step; the reference itself has no native loader to match
    (SURVEY.md top-level fact #1).
    """

    def __init__(self, dataloader, depth: int = 2, prepare_fn=None,
                 workers: int = 1):
        """`prepare_fn(batch)`, if given, runs in the worker thread after the
        host pipeline — used to START the host->device upload of the batch
        arrays while the previous step computes (jnp.asarray dispatches the
        transfer asynchronously; over the axon tunnel the ~5-15 MB payload
        otherwise serializes with the step, measured at ~0.5 s/step).

        `workers > 1` builds batches in a thread pool (PIL releases the GIL,
        so the pipeline scales to a few threads) and `get()` still delivers
        in scheduled order. Opt-in (cfg.tpu.train_loader_workers): the
        dataloader's augmentation RNG draws then interleave across threads,
        so batch contents are no longer bit-reproducible against the
        single-worker order — fine for throughput runs, off by default."""
        import queue
        import threading

        self.dataloader = dataloader
        self.prepare_fn = prepare_fn
        self.workers = max(1, int(workers))
        self._request = queue.Queue()
        if self.workers == 1:
            self._queue = queue.Queue(maxsize=depth)
            self._threads = [threading.Thread(target=self._worker, daemon=True)]
        else:
            # out-of-order completion -> in-order delivery: results keyed by
            # arrival order ticket; a semaphore keeps <= depth batches built
            # but not yet consumed (backpressure, as the bounded queue did)
            self._cv = threading.Condition()
            self._results = {}
            self._order = []  # tickets in scheduled order
            self._next_ticket = 0
            self._slots = threading.Semaphore(max(depth, self.workers))
            self._threads = [
                threading.Thread(target=self._pool_worker, daemon=True)
                for _ in range(self.workers)
            ]
        for t in self._threads:
            t.start()

    def _worker(self):
        while True:
            index = self._request.get()
            if index is None:
                return
            try:
                batch = self.dataloader.get_batch(index)
                prepared = self.prepare_fn(batch) if self.prepare_fn else None
                self._queue.put((index, batch, prepared))
            except Exception as e:  # surface loader errors to the consumer
                self._queue.put((index, e, None))

    def _pool_worker(self):
        while True:
            item = self._request.get()
            if item is None:
                return
            ticket, index = item
            self._slots.acquire()
            try:
                batch = self.dataloader.get_batch(index)
                prepared = self.prepare_fn(batch) if self.prepare_fn else None
                result = (index, batch, prepared)
            except Exception as e:  # surface loader errors to the consumer
                result = (index, e, None)
            with self._cv:
                self._results[ticket] = result
                self._cv.notify_all()

    def schedule(self, index: int):
        if self.workers == 1:
            self._request.put(index)
        else:
            self._request.put((self._next_ticket, index))
            self._order.append(self._next_ticket)
            self._next_ticket += 1

    def get(self):
        if self.workers == 1:
            index, batch, prepared = self._queue.get()
        else:
            ticket = self._order.pop(0)
            with self._cv:
                while ticket not in self._results:
                    self._cv.wait()
                index, batch, prepared = self._results.pop(ticket)
            self._slots.release()
        if isinstance(batch, Exception):
            raise batch
        return index, batch, prepared

    def close(self):
        for _ in self._threads:
            self._request.put(None)


def train_one_batch(batch, params, opt_state, train_step: TrainStep, logger,
                    dump_dir=None, mesh=None, prepared=None,
                    defer_metrics=False):
    """One training iteration (os2d/engine/train.py:47-139).

    With a `mesh`, the image batch (and per-image GT) shards over the mesh's
    data axis and params/optimizer state are replicated; XLA inserts the
    gradient all-reduce over ICI. `prepared` takes (arrays, c_pad) from
    prepare_batch_arrays when the prefetcher already started the upload.

    With `defer_metrics=True` the third return value is a zero-arg
    `finalize()` callable instead of a meters dict: the caller dispatches
    the NEXT step before calling it, so the per-step device->host metric
    sync hides behind the next step's compute (the NaN reproducer dump runs
    inside finalize, on the exact step's inputs — the step's own
    finite-guard already skipped the bad update on device).
    """
    t_start = time.time()
    arrays, c_pad = prepared if prepared is not None else (
        prepare_batch_arrays(batch))
    if mesh is not None:
        from ..parallel.mesh import make_sharded_train_inputs

        arrays = _decode_packed_images(arrays)
        params, opt_state, arrays = make_sharded_train_inputs(
            mesh, params, opt_state, arrays
        )
    params, opt_state, metrics = train_step(params, opt_state, arrays, c_pad)

    def finalize():
        meters = dict(metrics.materialized())
        if not math.isfinite(meters.get("grad_norm", 0.0)):
            # the jitted step already skipped the update (finite-guard); dump
            # a reproducer like the reference (os2d/engine/train.py:116-129).
            # `params`/`opt_state` here are the step's outputs, which equal
            # its inputs exactly because the non-finite update was skipped.
            dump_path = dump_nan_reproducer(
                dump_dir, arrays, params, opt_state, c_pad,
                extra={"meters": meters},
            )
            logger.error(
                f"gradient is not finite; the update was skipped. Saved "
                f"reproducer to {dump_path} — reload with "
                f"os2d_tpu.engine.train.load_nan_reproducer"
            )
        meters["batch_time"] = time.time() - t_start
        return meters

    if defer_metrics:
        return params, opt_state, finalize
    return params, opt_state, finalize()


def train_k_batches(prepared_list, params, opt_state, train_step: TrainStep,
                    logger, dump_dir=None, mesh=None):
    """K same-signature training iterations in ONE device dispatch
    (TrainStep.multi): hides the per-step dispatch+sync tunnel latency that
    a sequential loop pays K times (VERDICT r2 item 2).

    Returns (params, opt_state, finalize) where finalize() -> list of K
    per-step meters dicts (one device->host transfer for the whole group);
    callers dispatch the NEXT group before finalizing, so the sync hides
    behind it. A non-finite step j inside the group has its update skipped
    on device (per-step finite-guard, like the single-step path); finalize
    dumps a reproducer holding the GROUP-INPUT params plus all K batches
    and j — replaying j steps from it reproduces the event exactly."""
    t_start = time.time()
    if mesh is not None:
        prepared_list = [(_decode_packed_images(a), c) for a, c in
                         prepared_list]
    stacked, c_pad = stack_prepared_batches(prepared_list)
    group_in_params, group_in_opt = params, opt_state
    if mesh is not None:
        from ..parallel.mesh import make_sharded_train_inputs

        params, opt_state, stacked = make_sharded_train_inputs(
            mesh, params, opt_state, stacked, batch_axis=1
        )
        group_in_params, group_in_opt = params, opt_state
    k_steps = len(prepared_list)
    params, opt_state, metric_keys, metric_vecs = train_step.multi(
        params, opt_state, stacked, c_pad
    )

    def finalize():
        vecs = np.asarray(metric_vecs)  # ONE transfer for the K steps
        per_step = [
            {k: float(v) for k, v in zip(metric_keys, vecs[j])}
            for j in range(k_steps)
        ]
        bad = [j for j, m in enumerate(per_step)
               if not math.isfinite(m.get("grad_norm", 0.0))]
        if bad:
            dump_path = dump_nan_reproducer(
                dump_dir, stacked, group_in_params, group_in_opt, c_pad,
                extra={"meters": per_step[bad[0]],
                       "group_step_index": bad[0], "group_size": k_steps},
            )
            logger.error(
                f"gradient not finite at step {bad[0]} of a {k_steps}-step "
                f"group; the update was skipped on device. Saved group "
                f"reproducer to {dump_path} (replay group_step_index steps "
                f"from the dumped group-input params to reproduce)"
            )
        dt = (time.time() - t_start) / k_steps
        for m in per_step:
            m["batch_time"] = dt
        return per_step

    return params, opt_state, finalize


def evaluate_model(dataloaders_eval, model, params, cfg, criterion=None,
                   print_per_class_results=False, mesh=None):
    from .evaluate import evaluate

    meters_all = {}
    for dataloader in dataloaders_eval:
        if dataloader is not None:
            meters_all[dataloader.get_name()] = evaluate(
                dataloader, model, params, cfg, criterion=criterion,
                print_per_class_results=print_per_class_results,
                mesh=mesh,
            )
    return meters_all


def trainval_loop(dataloader_train, model, params, cfg, objective_cfg,
                  optimizer, opt_state, dataloaders_eval=(), start_iter=0,
                  full_log=None, mesh=None):
    """Main train+val loop (os2d/engine/train.py:400-567).

    start_iter/full_log support exact resume from a checkpoint (iteration,
    lr-in-optimizer-state, metric log) — state the reference loses
    (SURVEY.md §5.4).

    With a `mesh` (built in main.py from cfg.tpu.mesh_data_axis), training is
    data-parallel over the mesh and eval shards the class axis.
    """
    logger = logging.getLogger("OS2D.train")
    t_start = time.time()
    ckpt_backend = str(cfg.tpu.get("checkpoint_backend", "pickle"))
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        if n_dev <= 1:
            mesh = None
        elif cfg.train.do_training and cfg.train.batch_size % n_dev:
            raise ValueError(
                f"train.batch_size={cfg.train.batch_size} must be divisible "
                f"by the mesh size {n_dev} for data-parallel training"
            )
        else:
            logger.info(
                f"Data-parallel training over {n_dev} devices "
                f"({cfg.train.batch_size // n_dev} images/chip)"
            )

    dcc_raw = cfg.tpu.get("device_class_cache", "auto")
    # normalize case/synonyms so YAML/CLI overrides like 'False' or 'OFF'
    # can't silently fall through to 'auto' (ADVICE r3); unknown literals
    # are an error, not a silent mode
    dcc = str(dcc_raw).lower()
    if dcc in ("false", "off", "0", "no", "none"):
        dcc = "off"
    elif dcc in ("true", "1", "yes", "required"):
        dcc = "required"
    elif dcc != "auto":
        raise ValueError(
            f"tpu.device_class_cache={dcc_raw!r}: expected one of "
            "auto / True (required) / False (off)")
    if cfg.train.do_training and dcc != "off":
        from ..data.class_cache import DeviceClassCache

        try:
            dataloader_train.attach_device_class_cache(DeviceClassCache.build(
                dataloader_train,
                budget_mb=int(
                    cfg.tpu.get("device_class_cache_budget_mb", 2048)),
            ))
        except ValueError as e:
            # "auto" falls back to host-built class images (incompatible
            # augmentation recipe or over the HBM budget); "required"
            # means the user requires the cache, so surface the error
            if dcc == "required":
                raise
            logger.info("device class cache disabled (auto): %s", e)

    from ..parallel.mesh import primary_host

    if (cfg.visualization.train.show_gt_boxes_dataloader and cfg.output.path
            and primary_host() and len(dataloader_train) > 0):
        # debug figures of the first training batch's GT boxes
        # (reference dataloader.py:135; saved to files instead of shown)
        from ..utils.visualization import show_gt_boxes

        viz_dir = os.path.join(cfg.output.path, "viz_dataloader")
        os.makedirs(viz_dir, exist_ok=True)
        batch0 = dataloader_train.get_batch(0)
        for i in range(len(batch0["images"])):
            valid = np.asarray(batch0["gt_valid"][i])
            show_gt_boxes(
                np.asarray(batch0["images"][i]),
                np.asarray(batch0["gt_boxes"][i])[valid],
                labels=np.asarray(batch0["gt_labels"][i])[valid],
                difficult=np.asarray(batch0["gt_difficult"][i])[valid],
                save_path=os.path.join(viz_dir, f"gt_batch0_img{i}.png"),
            )

    # cfg-wired batch preparation: EVERY prepare_batch_arrays call in this
    # loop (prefetcher worker, mesh main-thread fallback, viz) goes through
    # this partial, so cfg.tpu.upload_* apply uniformly — a user who pins
    # upload_pixel_format="rgb8" gets the bit-exact wire on mesh runs too
    _prep = partial(
        prepare_batch_arrays,
        upload_streams=int(cfg.tpu.get("upload_streams", 2)),
        upload_serialize=bool(cfg.tpu.get("upload_serialize", False)),
        pixel_format=str(cfg.tpu.get("upload_pixel_format", "auto")))

    if (cfg.visualization.train.show_target_remapping and cfg.output.path
            and primary_host() and len(dataloader_train) > 0):
        batch_arrays, n_cls = _prep(dataloader_train.get_batch(0))
        batch_arrays = _decode_packed_images(batch_arrays)
        visualize_target_remapping_for_batch(
            batch_arrays, n_cls, params, model.config, cfg.train,
            os.path.join(cfg.output.path, "viz_remapping"),
            objective_cfg=objective_cfg,
        )
    full_log = full_log if full_log is not None else init_log()
    num_steps_for_logging, meters_running = 0, {}
    train_step = TrainStep(model.config, objective_cfg, optimizer, cfg.train)

    # one-behind metric consumption state: ([i_iters], loading_time,
    # finalize -> [meters per iter]) — a 1-elem group for single-step mode
    pending_meters = None

    def _consume_pending_meters():
        nonlocal pending_meters, num_steps_for_logging
        if pending_meters is None:
            return
        p_iters, p_loading_time, p_finalize = pending_meters
        pending_meters = None
        meters_list = p_finalize()
        for pi_iter, meters in zip(p_iters, meters_list):
            meters = dict(meters)
            meters["loading_time"] = p_loading_time / len(p_iters)
            if pi_iter % cfg.output.print_iter == 0:
                print_meters(meters, logger)
            add_to_meters_in_dict(meters, meters_running)
            num_steps_for_logging += 1

    best_model_metric = None
    best_model_dataset_name = None
    checkpoint_best_model_name = None
    checkpoint_best_model_path = None

    if cfg.train.optim.max_iter > 0 and cfg.train.do_training:
        logger.info("Start training")
        anneal_lr_func = setup_lr(full_log, cfg.train.optim.anneal_lr, cfg.eval.iter,
                                  initial_steps=start_iter // max(cfg.eval.iter, 1))

        meters_eval = evaluate_model(dataloaders_eval, model, params, cfg,
                                     criterion=objective_cfg, mesh=mesh)

        if cfg.output.best_model.do_get_best_model:
            best_model_dataset_name = (
                cfg.output.best_model.dataset
                if cfg.output.best_model.dataset
                else cfg.eval.dataset_names[0]
            )
            best_model_metric = meters_eval[best_model_dataset_name][
                cfg.output.best_model.metric
            ]
            logger.info(
                f"Init model is the current best on {best_model_dataset_name} "
                f"by {cfg.output.best_model.metric}, value {best_model_metric:.4f}"
            )
            if cfg.output.path:
                checkpoint_best_model_name = (
                    f"best_model_{best_model_dataset_name}_"
                    f"{cfg.output.best_model.metric}"
                )
                checkpoint_best_model_path = checkpoint_model(
                    params, opt_state, cfg.output.path,
                    model_name=checkpoint_best_model_name,
                    extra_fields={"criterion_value": best_model_metric},
                    backend=ckpt_backend,
                )
            else:
                raise RuntimeError(
                    "cfg.output.best_model.do_get_best_model requires cfg.output.path"
                )

        if start_iter == 0:
            log_meters(full_log, t_start, -1, cfg.output.path, meters_eval=meters_eval)
            if cfg.output.path:
                checkpoint_model(params, opt_state, cfg.output.path, i_iter=0,
                                 full_log=full_log, backend=ckpt_backend)

        # K-step dispatch groups (cfg.tpu.train_steps_per_dispatch > 1):
        # consecutive same-signature iterations run as ONE lax.scan program
        # (TrainStep.multi), hiding the per-step dispatch+sync tunnel
        # latency; groups flush at eval/mining/checkpoint/epoch boundaries
        k_dispatch = max(1, int(cfg.tpu.get("train_steps_per_dispatch", 1)))
        mine_iter = int(cfg.train.mining.mine_hard_patches_iter)
        max_iter = int(cfg.train.optim.max_iter)
        loader_workers = max(1, int(cfg.tpu.get("train_loader_workers", 1)))
        prefetcher = BatchPrefetcher(
            dataloader_train, depth=k_dispatch + 1,
            prepare_fn=None if mesh is not None else _prep,
            workers=loader_workers,
        )
        pending = 0  # batches scheduled on the prefetcher, not yet fetched
        i_epoch = 0
        i_batch = len(dataloader_train)
        i_iter = start_iter
        while i_iter < max_iter:
            if i_batch >= len(dataloader_train):
                assert not pending  # never shuffle under a scheduled batch
                i_epoch += 1
                i_batch = 0
                dataloader_train.shuffle()

            if cfg.train.mining.do_mining and i_iter % mine_iter == 0:
                from .mining import mine_hard_patches

                hardnegdata = mine_hard_patches(
                    dataloader_train, model, params, cfg, objective_cfg
                )
                dataloader_train.set_hard_negative_data(hardnegdata)

            # group length: up to k_dispatch iters, stopping at the next
            # boundary (end of epoch / eval / mining / periodic checkpoint /
            # max_iter) so every boundary still sees up-to-date params
            group_len = min(
                k_dispatch,
                max_iter - i_iter,
                len(dataloader_train) - i_batch,
                cfg.eval.iter - (i_iter % cfg.eval.iter),
            )
            if cfg.train.mining.do_mining:
                group_len = min(group_len, mine_iter - (i_iter % mine_iter))
            if cfg.output.path and cfg.output.save_iter:
                save_iter = int(cfg.output.save_iter)
                nxt = (i_iter if i_iter % save_iter == 0
                       else i_iter + save_iter - i_iter % save_iter)
                if nxt < i_iter + group_len:
                    group_len = nxt - i_iter + 1

            logger.info(
                f"Iter {i_iter}"
                + (f"-{i_iter + group_len - 1}" if group_len > 1 else "")
                + f" ({max_iter}), epoch {i_epoch}, time {time_since(t_start)}"
            )

            t_load = time.time()
            while pending < group_len:
                prefetcher.schedule(i_batch + pending)
                pending += 1
            group = []
            for _ in range(group_len):
                _, b, prep = prefetcher.get()
                pending -= 1
                # mesh runs prepare on the main thread (the prefetcher's
                # prepare_fn is None there) — still through the cfg-wired
                # _prep, never bare-default prepare_batch_arrays
                group.append((b, prep if prep is not None else _prep(b)))
            loading_time = time.time() - t_load
            i_batch += group_len
            group_end = i_iter + group_len

            # schedule ahead for the next group: within this epoch and never
            # past a mining boundary (mining swaps the dataloader's
            # hard-negative data, so pre-mining fetches would be stale)
            ahead = min(k_dispatch, len(dataloader_train) - i_batch,
                        max_iter - group_end)
            if cfg.train.mining.do_mining:
                ahead = 0 if group_end % mine_iter == 0 else min(
                    ahead, mine_iter - (group_end % mine_iter))
            while pending < ahead:
                prefetcher.schedule(i_batch + pending)
                pending += 1

            # one-behind metrics: dispatch group g, THEN read group g-1's
            # metrics so the device->host sync rides behind group g's
            # compute; flushed before anything that reads meters_running
            if group_len == 1:
                batch, prepared = group[0]
                params, opt_state, fin_one = train_one_batch(
                    batch, params, opt_state, train_step, logger,
                    dump_dir=cfg.output.path or None, mesh=mesh,
                    prepared=prepared, defer_metrics=True,
                )
                finalize = (lambda f: (lambda: [f()]))(fin_one)
            else:
                prepared_list = [prep for _, prep in group]
                # batches with different image/anchor signatures (a bucket
                # switch mid-group) cannot share one compiled scan; split
                # the group into maximal same-signature runs
                runs, run_start = [], 0
                for j in range(1, len(prepared_list)):
                    if (batch_signature(prepared_list[j])
                            != batch_signature(prepared_list[run_start])):
                        runs.append((run_start, j))
                        run_start = j
                runs.append((run_start, len(prepared_list)))
                fins = []
                for (rs, re) in runs:
                    if re - rs == 1:
                        params, opt_state, f1 = train_one_batch(
                            group[rs][0], params, opt_state, train_step,
                            logger, dump_dir=cfg.output.path or None,
                            mesh=mesh, prepared=prepared_list[rs],
                            defer_metrics=True,
                        )
                        fins.append((lambda f: (lambda: [f()]))(f1))
                    else:
                        params, opt_state, fk = train_k_batches(
                            prepared_list[rs:re], params, opt_state,
                            train_step, logger,
                            dump_dir=cfg.output.path or None, mesh=mesh,
                        )
                        fins.append(fk)
                finalize = (lambda fs: (lambda: [
                    m for f in fs for m in f()]))(fins)
            new_pending_meters = (
                list(range(i_iter, group_end)), loading_time, finalize)
            _consume_pending_meters()
            pending_meters = new_pending_meters
            i_iter = group_end - 1  # boundary handling below refers to the
            # LAST iter of the group (group_len was capped so any boundary
            # falls exactly there); the loop tail advances to group_end

            if (i_iter + 1) % cfg.eval.iter == 0:
                _consume_pending_meters()
                meters_eval = evaluate_model(dataloaders_eval, model, params, cfg,
                                             criterion=objective_cfg, mesh=mesh)

                if cfg.output.best_model.do_get_best_model:
                    cur_metric = meters_eval[best_model_dataset_name][
                        cfg.output.best_model.metric
                    ]
                    better = (
                        cur_metric > best_model_metric
                        if cfg.output.best_model.mode == "max"
                        else cur_metric < best_model_metric
                    )
                    if better:
                        logger.info(
                            f"New best model on {best_model_dataset_name}: "
                            f"{cur_metric:.4f}"
                        )
                        if cfg.output.path:
                            checkpoint_best_model_path = checkpoint_model(
                                params, opt_state, cfg.output.path,
                                model_name=checkpoint_best_model_name,
                                extra_fields={"criterion_value": cur_metric},
                                backend=ckpt_backend,
                            )
                        best_model_metric = cur_metric

                for k in meters_running:
                    meters_running[k] /= num_steps_for_logging
                old_lr = get_learning_rate(opt_state)
                meters_running["lr"] = old_lr

                log_meters(full_log, t_start, i_iter, cfg.output.path,
                           meters_running=meters_running, meters_eval=meters_eval)

                new_lr = anneal_lr_func(
                    i_iter + 1,
                    old_lr,
                    anneal_now=i_iter > cfg.train.optim.anneal_lr.initial_patience,
                )
                if new_lr != old_lr:
                    if (cfg.train.optim.anneal_lr.reload_best_model_after_anneal_lr
                            and checkpoint_best_model_path):
                        from ..utils.logger import load_checkpoint

                        ckpt = load_checkpoint(checkpoint_best_model_path)
                        params = jax.tree_util.tree_map(jnp.asarray, ckpt["net"])
                        if ckpt.get("optimizer") is not None:
                            opt_state = jax.tree_util.tree_map(
                                jnp.asarray, ckpt["optimizer"]
                            )
                    set_learning_rate(opt_state, new_lr)

                num_steps_for_logging, meters_running = 0, {}

            if (cfg.output.path and cfg.output.save_iter
                    and i_iter % cfg.output.save_iter == 0):
                checkpoint_model(params, opt_state, cfg.output.path, i_iter=i_iter,
                                 full_log=full_log, backend=ckpt_backend)

            i_iter = group_end

        _consume_pending_meters()
        while pending:
            prefetcher.get()
            pending -= 1
        prefetcher.close()

    logger.info("Final evaluation")
    meters_eval = evaluate_model(
        dataloaders_eval, model, params, cfg, print_per_class_results=True,
        mesh=mesh,
    )
    if cfg.train.optim.max_iter > 0 and cfg.train.do_training:
        log_meters(full_log, t_start, cfg.train.optim.max_iter, cfg.output.path,
                   meters_eval=meters_eval)
        if cfg.output.path:
            checkpoint_model(
                params, opt_state, cfg.output.path,
                i_iter=cfg.train.optim.max_iter, full_log=full_log,
                backend=ckpt_backend,
            )
    return params, opt_state, full_log, meters_eval

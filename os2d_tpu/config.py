"""Configuration tree: same shape and defaults as the reference yacs config
(os2d/config.py:7-271) so the reference's experiment YAMLs and dotted CLI
override grammar (`--config-file FILE k.ey value ...`, main.py:15-37) stay
portable, implemented with a small self-contained node class (no yacs).

TPU-specific additions are grouped under `cfg.tpu`.
"""

from __future__ import annotations

import ast
import copy
from typing import Any, List


# Reference-compat keys that are accepted (so reference YAMLs stay portable,
# os2d/config.py:11) but have no effect on TPU: device placement is JAX's.
# Overriding one gets a one-time warning instead of silently doing nothing.
_INERT_COMPAT_KEYS = {"is_cuda"}
_warned_inert: set = set()


def _warn_if_inert(full_key: str):
    if full_key in _INERT_COMPAT_KEYS and full_key not in _warned_inert:
        import warnings

        _warned_inert.add(full_key)
        warnings.warn(
            f"Config key '{full_key}' is accepted for reference compatibility "
            f"but has no effect in os2d_tpu (device choice is JAX's).",
            stacklevel=3,
        )


class ConfigNode(dict):
    """Nested attribute-dict with yacs-like merge/override semantics."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def clone(self):
        return copy.deepcopy(self)

    def merge_from_dict(self, other: dict, _path=""):
        for k, v in other.items():
            full = f"{_path}.{k}" if _path else k
            if k not in self:
                raise KeyError(f"Unknown config key: {full}")
            if isinstance(self[k], ConfigNode):
                if not isinstance(v, dict):
                    raise TypeError(f"Cannot override subtree {full} with a value")
                self[k].merge_from_dict(v, full)
            else:
                _warn_if_inert(full)
                self[k] = _coerce(v, self[k], full)

    def merge_from_file(self, path: str):
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f)
        if data:
            self.merge_from_dict(data)

    def merge_from_list(self, opts: List[str]):
        assert len(opts) % 2 == 0, f"Override list must be key value pairs: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = getattr(node, p)
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Unknown config key: {key}")
            _warn_if_inert(key)
            if isinstance(value, str):
                try:
                    value = ast.literal_eval(value)
                except (ValueError, SyntaxError):
                    pass  # keep as string
            node[leaf] = _coerce(value, node[leaf], key)

    def freeze(self):
        return self  # kept for API compatibility with yacs callers


def _coerce(value: Any, old: Any, key: str) -> Any:
    if old is None or value is None:
        return value
    if isinstance(old, bool):
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            return value.lower() in ("true", "1", "yes")
        return bool(value)
    if isinstance(old, float) and isinstance(value, (int, float, str)):
        return float(value)
    if isinstance(old, int) and not isinstance(old, bool) and isinstance(value, (int, float)):
        return int(value)
    if isinstance(old, (list, tuple)) and isinstance(value, (list, tuple)):
        return list(value)
    if isinstance(old, str):
        return str(value)
    return value


def _cn(**kwargs):
    node = ConfigNode()
    for k, v in kwargs.items():
        node[k] = v
    return node


def get_default_cfg() -> ConfigNode:
    cfg = _cn(
        is_cuda=True,  # kept for config compatibility; device choice is JAX's
        random_seed=42,
        model=_cn(
            backbone_arch="ResNet50",
            merge_branch_parameters=True,
            use_inverse_geom_model=True,
            use_simplified_affine_model=False,
            class_image_size=240,
            use_group_norm=False,
            normalization_mean=[0.485, 0.456, 0.406],
            normalization_std=[0.229, 0.224, 0.225],
        ),
        init=_cn(model="", transform=""),
        train=_cn(
            do_training=True,
            batch_size=4,
            class_batch_size=15,
            dataset_name="grozi-train",
            dataset_scale=1280.0,
            cache_images=True,
            objective=_cn(
                class_objective="RLL",
                neg_margin=0.5,
                pos_margin=0.6,
                loc_weight=0.2,
                positive_iou_threshold=0.5,
                negative_iou_threshold=0.1,
                neg_to_pos_ratio=3,
                class_neg_weight=1.0,
                rll_neg_weight_ratio=0.001,
                remap_classification_targets=True,
                remap_classification_targets_iou_pos=0.8,
                remap_classification_targets_iou_neg=0.4,
            ),
            model=_cn(
                train_features=True,
                freeze_bn=True,
                freeze_bn_transform=True,
                freeze_transform=False,
                num_frozen_extractor_blocks=0,
                train_transform_on_negs=False,
            ),
            augment=_cn(
                train_patch_width=600,
                train_patch_height=600,
                scale_jitter=0.7,
                jitter_aspect_ratio=0.9,
                random_flip_batches=False,
                random_color_distortion=False,
                random_crop_class_images=False,
                min_box_coverage=0.7,
                mine_extra_class_images=False,
            ),
            mining=_cn(
                do_mining=False,
                mine_hard_patches_iter=5000,
                num_hard_patches_per_image=10,
                num_random_pyramid_scales=2,
                num_random_negative_classes=200,
                nms_iou_threshold_in_mining=0.5,
            ),
            optim=_cn(
                lr=1e-4,
                max_iter=200000,
                optim_method="sgd",
                weight_decay=1e-4,
                sgd_momentum=0.9,
                max_grad_norm=1e2,
                anneal_lr=_cn(
                    type="none",
                    milestones=[],
                    gamma=0.1,
                    quantity_to_monitor="mAP@0.50_grozi-val-new-cl",
                    quantity_mode="max",
                    quantity_epsilon=1e-2,
                    reduce_factor=0.5,
                    min_value=1e-5,
                    patience=1000,
                    initial_patience=0,
                    cooldown=10000,
                    quantity_smoothness=2000,
                    reload_best_model_after_anneal_lr=True,
                ),
            ),
        ),
        eval=_cn(
            iter=5000,
            dataset_names=["grozi-val-new-cl", "grozi-val-old-cl"],
            dataset_scales=[1280],
            cache_images=False,
            scales_of_image_pyramid=[0.5, 0.625, 0.8, 1, 1.2, 1.4, 1.6],
            train_subset_for_eval_size=0,
            nms_iou_threshold=0.3,
            nms_score_threshold=float("-inf"),
            nms_across_classes=False,
            mAP_iou_thresholds=[0.5],
            batch_size=1,
            class_image_augmentation="",
            exact_class_shapes=False,  # TPU addition: exact class-image resize
        ),
        output=_cn(
            path="",
            save_log_to_file=False,
            print_iter=1,
            save_iter=50000,
            best_model=_cn(
                do_get_best_model=False, dataset="", metric="mAP@0.50", mode="max"
            ),
        ),
        visualization=_cn(
            eval=_cn(
                show_gt_boxes=False,
                show_detections=False,
                max_detections=10,
                score_threshold=float("-inf"),
                show_class_heatmaps=False,
                images_for_heatmaps=[],
                labels_for_heatmaps=[],
                path_to_save_detections="",
            ),
            train=_cn(
                show_gt_boxes_dataloader=False,
                show_detections=False,
                max_detections=5,
                score_threshold=float("-inf"),
                show_target_remapping=False,
            ),
            mining=_cn(
                show_gt_boxes=False,
                show_class_heatmaps=False,
                images_for_heatmaps=[],
                labels_for_heatmaps=[],
                show_mined_patches=False,
                max_detections=10,
                score_threshold=float("-inf"),
            ),
        ),
        # --- TPU-native additions ---
        tpu=_cn(
            compute_dtype="float32",  # "float32" | "bfloat16"
            resample_precision="default",  # matmul precision of the resample op:
                                        # "highest" (fp32-exact) | "high" | "default"
                                        # 'default' validated mAP-neutral by
                                        # tools/map_sensitivity.py (r2): dmAP
                                        # +0.0000, score delta mean 3e-4
            corr_interior_first=True,  # correlation channels emitted with
                                        # the pool-mask interior as a
                                        # contiguous prefix (mAP-identical,
                                        # kills an interior-compaction
                                        # relayout; models/head.py)
            resample_t_chunk=0,       # template points per unrolled resample
                                        # chunk; 0 = measured heuristic
                                        # (ops/sampling.py)
            eval_class_chunk=16,      # classes per head call at eval; bounds
                                        # the [chunk, A, 225] correlation
                                        # tensor at the LARGEST pyramid level
            eval_class_chunk_per_level=True,  # let SMALLER pyramid levels run
                                        # proportionally larger class chunks
                                        # (same memory bound, fewer scan
                                        # steps; numerics identical;
                                        # single-chip path only)
            eval_shard_axis="classes",  # mesh eval strategy: "classes"
                                        # (each chip scores a slice of the
                                        # class bank; huge catalogs) or
                                        # "images" (each chip owns a slice
                                        # of the image batch; set
                                        # eval.batch_size to the mesh size)
            eval_class_prescreen=True,  # large-catalog prescreen: skip the
                                        # alignment/resample head for classes
                                        # whose correlation ceiling is below
                                        # eval.nms_score_threshold (NO-MISS:
                                        # resampled scores are mask-weighted
                                        # averages of correlations, so
                                        # max(corr) bounds every score up to
                                        # a derived rounding margin — see
                                        # engine.evaluate.prescreen_margin).
                                        # Active only when the threshold is
                                        # finite; -inf (the default) keeps
                                        # every class.
            eval_prefetch_depth=1,    # fused-eval upload lookahead (batches).
                                        # 1 = at most one QUEUED upload ahead
                                        # of the consumer (the dequeued
                                        # batch's async transfer may still be
                                        # in flight, so two can briefly
                                        # overlap; upload_serialize=True is
                                        # the strict one-in-flight fence),
                                        # overlapped with compute. Measured on
                                        # the axon tunnel: CONCURRENT uploads
                                        # contend (2 full batches in flight =
                                        # 12.8 MB/s aggregate vs 20.3 single),
                                        # so depth 2 HALVED end-to-end eval
                                        # (4.9 vs 8.2 img/s) — BENCH_NOTES r3.
            upload_streams=2,         # split each image-batch upload into
                                        # k parallel chunked device_puts.
                                        # Default 2 (r4): the axon tunnel is
                                        # per-stream limited — 2-way chunking
                                        # = 1.82x bandwidth
                                        # (tools/bench_upload.py) and lifted
                                        # the steady-state driver bench
                                        # 5.98 -> 9.50 img/s in adjacent
                                        # same-window legs (BENCH_NOTES r4).
                                        # Set 1 for direct-attached hosts
                                        # where chunking is pure overhead.
            upload_serialize=False,   # hand batch uploads to the wire ONE at
                                        # a time with a completion fence.
                                        # MEASURED NEGATIVE as a default
                                        # (BENCH_NOTES r3): the fence's
                                        # readback round trip blocks the
                                        # producer thread's host prep, and
                                        # K-step groups absorb upload
                                        # contention under their long compute
                                        # anyway (K=8: 4.41 unfenced vs 2.65
                                        # fenced steps/s). Available for
                                        # tunnels where contention dominates.
            upload_pixel_format="auto",  # image wire format for the
                                        # host->device batch-image upload
                                        # (eval producer AND train
                                        # prefetcher):
                                        # "rgb8" (bit-exact, 3 B/px),
                                        # "yuv420" (BT.601 4:2:0, 1.5 B/px —
                                        # halves the binding upload payload;
                                        # lossy vs decoded RGB, mAP-gated at
                                        # the full protocol in
                                        # tests/test_pixel_format.py; odd-
                                        # sized batches fall back to rgb8),
                                        # or "auto" (default): yuv420 on
                                        # accelerator backends where the
                                        # host->device wire is the measured
                                        # bottleneck (BENCH_NOTES r4:
                                        # 10.55 vs 7.94/3.12 img/s A/B),
                                        # rgb8 on CPU so parity tests and
                                        # host-only runs stay bit-exact.
                                        # Pin "rgb8" for exact reference
                                        # reproduction on device.
            eval_pre_top_k=1024,      # per-label candidates kept before NMS
            eval_top_k=256,           # detections kept per label after NMS
            mesh_data_axis=-1,        # data-parallel axis size; -1 = all devices
            distributed_init=False,   # multi-host (pod) runs: call
                                        # jax.distributed.initialize() at CLI
                                        # startup so the mesh spans all hosts
                                        # (auto-detects on TPU pods; env
                                        # JAX_COORDINATOR_ADDRESS/
                                        # JAX_NUM_PROCESSES/JAX_PROCESS_ID
                                        # for explicit clusters)
            train_steps_per_dispatch=1,  # K>1: scan K train steps in ONE
                                        # device program (hides per-step
                                        # dispatch+sync latency on remote/
                                        # tunneled devices; groups flush at
                                        # eval/mining/checkpoint boundaries)
            train_loader_workers=1,   # host batch-builder threads; >1 scales
                                        # the PIL pipeline but interleaves
                                        # augmentation RNG draws across
                                        # threads (not bit-reproducible vs
                                        # the single-worker batch order)
            device_class_cache="auto",  # keep every (class, resample-method)
                                        # palette resize resident in HBM and
                                        # resolve train class images with an
                                        # on-device gather+flip (zero per-step
                                        # class upload; data/class_cache.py;
                                        # K=8 loop 5.77 -> 6.46 steps/s,
                                        # BENCH_NOTES r3). Needs distortion/
                                        # class-crop/extra-mining OFF and the
                                        # HBM budget (the grozi recipe fits).
                                        # "auto" (default): build when the
                                        # recipe is compatible, else fall back
                                        # to host class images with a log
                                        # line; True: required (raise if
                                        # incompatible); False: off.
                                        # NOTE: BOX/NEAREST resample draws
                                        # under flipped batches are an equally
                                        # valid phase-shifted resample, not
                                        # bit-identical to host
                                        # flip-then-resize (class_cache.py);
                                        # set False for bit-reproducibility
                                        # vs the host path.
            device_class_cache_budget_mb=2048,  # refuse to build beyond this
            device_side_pyramid=True,  # build eval pyramids on device from one uint8 image
            fold_bn=False,            # fold frozen BN into conv weights for eval
            quantize_class_feats=False,  # int8 class-feature bank (4x HBM saving)
            resume="",                # checkpoint path for exact training resume
            checkpoint_backend="pickle",  # "pickle" | "orbax"
        ),
    )
    return cfg

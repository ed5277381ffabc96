"""Hard-patch mining: find hard negatives / positives / localization errors.

Port of mine_hard_patches (os2d/engine/train.py:142-370) + the crop-box
construction BoxGridGenerator.get_box_to_cut_anchor
(os2d/modeling/box_coder.py:78-166). Scores come from the batched eval path
(randomized pyramid scales, random negative-class subset); per-anchor losses
from the objective's patch-mining mode; per-role NMS keeps the top crops per
image, emitted as records the dataloader replays exactly at training time via
its padding-aware crop path.
"""

from __future__ import annotations

import logging
import random
import time
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.head import ANCHOR_BOX, ANCHOR_STRIDE, ClassHead
from ..structures.feature_map import FeatureMapSize, feature_map_size_for_image
from ..utils.logger import time_since
from .decode import default_boxes_for_image_size
from .evaluate import Evaluator
from .objective import compute_objective
from .targets import encode_targets_single_image, remap_targets


def get_box_to_cut_anchor(img_size: FeatureMapSize, crop_size: FeatureMapSize,
                          fm_size: FeatureMapSize,
                          stride_w=None, stride_h=None,
                          box_w=None, box_h=None):
    """For each anchor, a crop_size box roughly centered on it and aligned to
    the anchor stride (numpy port of os2d/modeling/box_coder.py:78-166).

    Returns (crop_boxes [A, 4], anchor_boxes [A, 4], anchor_index [A]).
    """
    stride_w = float(ANCHOR_STRIDE.w if stride_w is None else stride_w)
    stride_h = float(ANCHOR_STRIDE.h if stride_h is None else stride_h)
    box_w = float(ANCHOR_BOX.w if box_w is None else box_w)
    box_h = float(ANCHOR_BOX.h if box_h is None else box_h)

    anchor_index = np.arange(fm_size.h * fm_size.w)
    ay = anchor_index // fm_size.w
    ax = anchor_index % fm_size.w
    cx = (ax.astype(np.float64) + 0.5) * stride_w
    cy = (ay.astype(np.float64) + 0.5) * stride_h

    box_left = cx - crop_size.w / 2
    box_top = cy - crop_size.h / 2

    anchor_boxes = np.stack(
        [cx - box_w / 2, cy - box_h / 2, cx + box_w / 2, cy + box_h / 2], axis=1
    ).astype(np.float32)

    def floor_to_stride(pos, stride):
        return (np.floor(pos) // stride) * stride

    def ceil_to_stride(pos, stride):
        return np.floor(np.ceil(np.floor(pos) / stride)) * stride

    box_left = np.where(box_left > 0, floor_to_stride(box_left, stride_w), 0.0)
    box_top = np.where(box_top > 0, floor_to_stride(box_top, stride_h), 0.0)
    box_right = box_left + crop_size.w
    box_bottom = box_top + crop_size.h

    # horizontal fit
    mask = box_right > img_size.w
    shift_left = ceil_to_stride(box_right - img_size.w, stride_w)
    good = (box_left - shift_left) >= 0
    sel = mask & good
    box_left = np.where(sel, box_left - shift_left, box_left)
    box_right = np.where(sel, box_right - shift_left, box_right)
    sel = mask & ~good
    box_left = np.where(sel, 0.0, box_left)
    box_right = np.where(sel, float(crop_size.w), box_right)

    # vertical fit
    mask = box_bottom > img_size.h
    shift_up = ceil_to_stride(box_bottom - img_size.h, stride_h)
    good = (box_top - shift_up) >= 0
    sel = mask & good
    box_top = np.where(sel, box_top - shift_up, box_top)
    box_bottom = np.where(sel, box_bottom - shift_up, box_bottom)
    sel = mask & ~good
    box_top = np.where(sel, 0.0, box_top)
    box_bottom = np.where(sel, float(crop_size.h), box_bottom)

    crop_boxes = np.stack([box_left, box_top, box_right, box_bottom], axis=1).astype(
        np.float32
    )
    return crop_boxes, anchor_boxes, anchor_index


def _nms_topk_host(boxes, scores, iou_threshold, top_k):
    """Greedy NMS on host numpy (small candidate sets in mining)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        b = boxes[i]
        x1 = np.maximum(b[0], boxes[:, 0])
        y1 = np.maximum(b[1], boxes[:, 1])
        x2 = np.minimum(b[2], boxes[:, 2])
        y2 = np.minimum(b[3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        area_i = (b[2] - b[0]) * (b[3] - b[1])
        iou = inter / np.maximum(area_i + area - inter, 1e-12)
        suppressed |= iou > iou_threshold
        suppressed[i] = True
        if len(keep) >= top_k:
            break
    return np.asarray(keep, np.int64)


def mine_hard_patches(dataloader, model, params, cfg, objective_cfg):
    """Returns hardnegdata_per_imageid consumed by
    dataloader.set_hard_negative_data (os2d/engine/train.py:142-370)."""
    logger = logging.getLogger("OS2D.mining_hard_patches")
    logger.info("Starting to mine hard patches")
    t_start = time.time()

    evaluator = Evaluator(model, cfg, "OS2D.mining")
    class_images, _, class_ids = dataloader.get_all_class_images()
    class_head, _ = evaluator.build_class_heads(params, class_images, "")
    num_all = len(class_ids)

    assert dataloader.data_augmentation is not None, (
        "Can mine hard patches only through data augmentation"
    )
    crop_size = dataloader.data_augmentation.random_crop_size
    num_random_negs = cfg.train.mining.num_random_negative_classes
    nms_iou = cfg.train.mining.nms_iou_threshold_in_mining
    top_k = cfg.train.mining.num_hard_patches_per_image

    hardnegdata_per_imageid = OrderedDict()

    iterator = dataloader.make_iterator_for_all_images(
        cfg.eval.batch_size,
        num_random_pyramid_scales=cfg.train.mining.num_random_pyramid_scales,
    )
    for batch_ids, pyramids, inverse_scales, _, _ in iterator:
        # label subset: random negatives + this batch's positives
        if num_random_negs >= 0:
            neg = list(range(num_all))
            random.shuffle(neg)
            neg = neg[:num_random_negs]
            pos_global = dataloader.dataset.get_class_ids_for_image_ids(batch_ids)
            pos_local = [
                class_ids.index(int(g)) for g in pos_global if int(g) in class_ids
            ]
            labels_local = sorted(set(neg) | set(pos_local))
        else:
            labels_local = list(range(num_all))
        batch_class_ids = [class_ids[l] for l in labels_local]

        sub_head = ClassHead(
            class_head.class_feats[np.asarray(labels_local)],
            class_head.pool_mask[np.asarray(labels_local)],
        )
        level_outputs = evaluator.score_pyramid(
            params, pyramids, sub_head, want_corners=True
        )
        level_img_sizes = [
            FeatureMapSize(w=p.shape[2], h=p.shape[1]) for p in pyramids
        ]
        level_fm_sizes = [feature_map_size_for_image(s) for s in level_img_sizes]
        num_labels = len(labels_local)

        for i_image, image_id in enumerate(batch_ids):
            ann = dataloader.dataset.get_image_annotation_for_imageid(image_id)
            local_labels = dataloader.convert_label_ids_global_to_local(
                ann.get_field("labels"), batch_class_ids
            )
            g = max(8, len(ann))
            gt_boxes = np.zeros((g, 4), np.float32)
            gt_labels = np.full((g,), -1, np.int32)
            gt_difficult = np.zeros((g,), bool)
            gt_valid = np.zeros((g,), bool)
            n = len(ann)
            if n:
                gt_boxes[:n] = ann.bbox_xyxy
                gt_labels[:n] = local_labels
                gt_difficult[:n] = ann.get_field("difficult")
                gt_valid[:n] = True

            # per-level targets + losses in ORIGINAL image coordinates
            per_level = []
            for i_p in range(len(pyramids)):
                sx, sy = inverse_scales[i_image][i_p]
                d_boxes = np.asarray(
                    default_boxes_for_image_size(level_img_sizes[i_p])
                ) * np.asarray([sx, sy, sx, sy], np.float32)
                loc_scores = level_outputs[i_p]["loc"][i_image][None]  # [1, L, 4, A]
                cls_scores = level_outputs[i_p]["cls"][i_image][None]

                loc_t, cls_t = encode_targets_single_image(
                    jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                    jnp.asarray(gt_difficult), jnp.asarray(gt_valid),
                    jnp.asarray(d_boxes), num_labels,
                    cfg.train.objective.positive_iou_threshold,
                    cfg.train.objective.negative_iou_threshold,
                )
                # remap on predicted boxes (scaled to original coords): decode
                # happens against the scaled default boxes, which equals
                # decoding at level coords then applying the inverse resize
                cls_remapped, _, _ = remap_targets(
                    loc_scores,
                    jnp.asarray(gt_boxes)[None],
                    jnp.asarray(gt_labels)[None],
                    jnp.asarray(gt_difficult)[None],
                    jnp.asarray(gt_valid)[None],
                    jnp.asarray(d_boxes),
                    cfg.train.objective.remap_classification_targets_iou_pos,
                    cfg.train.objective.remap_classification_targets_iou_neg,
                )
                per_level.append((loc_scores, cls_scores, loc_t[None], cls_t[None],
                                  cls_remapped))

            loc_p = jnp.concatenate([p[0] for p in per_level], axis=3)
            cls_p = jnp.concatenate([p[1] for p in per_level], axis=2)
            loc_t = jnp.concatenate([p[2] for p in per_level], axis=3)
            cls_t = jnp.concatenate([p[3] for p in per_level], axis=2)
            cls_r = jnp.concatenate([p[4] for p in per_level], axis=2)
            _, per_anchor = compute_objective(
                objective_cfg, loc_p, loc_t, cls_p, cls_t,
                cls_targets_remapped=cls_r, patch_mining_mode=True,
            )

            # split back per level
            level_sizes = [p[1].shape[2] for p in per_level]
            offsets = np.cumsum([0] + level_sizes)

            # device->host ONCE per image; rows are laid out level-major then
            # label-major: [level0: label0 A0 rows, label1 A0 rows, ...]
            cls_loss_np = np.asarray(per_anchor["cls_loss"])[0]  # [L, A_tot]
            loc_loss_np = np.asarray(per_anchor["loc_loss"])[0]
            pos_np = np.asarray(per_anchor["pos_mask"])[0]
            neg_np = np.asarray(per_anchor["neg_mask"])[0]
            pos_loc_np = np.asarray(per_anchor["pos_for_regression"])[0]

            crops_all, anchors_all, labels_all, levels_all = [], [], [], []
            losses_all, losses_loc_all = [], []
            pos_all, pos_loc_all, neg_all, anchor_idx_all = [], [], [], []
            corners_all, scores_all = [], []
            for i_p in range(len(pyramids)):
                sx, sy = inverse_scales[i_image][i_p]
                crop_boxes, anchor_boxes, anchor_index = get_box_to_cut_anchor(
                    level_img_sizes[i_p], crop_size, level_fm_sizes[i_p]
                )
                scale_vec = np.asarray([sx, sy, sx, sy], np.float32)
                crop_boxes = crop_boxes * scale_vec
                anchor_boxes = anchor_boxes * scale_vec
                sl = slice(offsets[i_p], offsets[i_p + 1])
                a = len(crop_boxes)
                corners = np.asarray(level_outputs[i_p]["corners"][i_image])
                corners = corners * np.tile(np.asarray([sx, sy], np.float32), 4)[
                    None, :, None
                ]  # [L, 8, A]
                crops_all.append(np.tile(crop_boxes, (num_labels, 1)))
                anchors_all.append(np.tile(anchor_boxes, (num_labels, 1)))
                labels_all.append(np.repeat(np.arange(num_labels), a))
                levels_all.append(np.full(num_labels * a, i_p))
                anchor_idx_all.append(np.tile(anchor_index, num_labels))
                losses_all.append(cls_loss_np[:, sl].reshape(-1))
                losses_loc_all.append(loc_loss_np[:, sl].reshape(-1))
                pos_all.append(pos_np[:, sl].reshape(-1))
                neg_all.append(neg_np[:, sl].reshape(-1))
                pos_loc_all.append(pos_loc_np[:, sl].reshape(-1))
                corners_all.append(
                    np.transpose(corners, (0, 2, 1)).reshape(num_labels * a, 8)
                )
                scores_all.append(
                    np.asarray(level_outputs[i_p]["cls"][i_image]).reshape(-1)
                )

            scores_np = np.concatenate(scores_all)
            crops_all = np.concatenate(crops_all)
            anchors_all = np.concatenate(anchors_all)
            labels_all = np.concatenate(labels_all)
            levels_all = np.concatenate(levels_all)
            anchor_idx_all = np.concatenate(anchor_idx_all)
            losses_all = np.concatenate(losses_all)
            losses_loc_all = np.concatenate(losses_loc_all)
            pos_all = np.concatenate(pos_all)
            neg_all = np.concatenate(neg_all)
            pos_loc_all = np.concatenate(pos_loc_all)
            corners_all = np.concatenate(corners_all)

            def mine(mask, scores):
                ids = np.nonzero(mask)[0]
                if len(ids) == 0:
                    return ids
                keep = _nms_topk_host(crops_all[ids], scores[ids], nms_iou, top_k)
                return ids[keep]

            records = []

            def add(ids, role):
                for i in ids:
                    records.append(
                        OrderedDict(
                            pyramid_level=int(levels_all[i]),
                            label_local=int(labels_all[i]),
                            anchor_index=int(anchor_idx_all[i]),
                            role=role,
                            crop_position_xyxy=crops_all[i].copy(),
                            anchor_position_xyxy=anchors_all[i].copy(),
                            transform_corners=corners_all[i].copy(),
                            label_global=int(batch_class_ids[int(labels_all[i])]),
                            loss=float(losses_all[i]),
                            loss_loc=float(losses_loc_all[i]),
                            score=float(scores_np[i]),
                            image_id=image_id,
                        )
                    )

            add(mine(neg_all, losses_all), "neg")
            add(mine(pos_all, losses_all), "pos")
            add(mine(pos_loc_all, losses_loc_all), "pos_loc")
            hardnegdata_per_imageid[image_id] = records

            # debug figures (reference train.py:365-366; saved to files)
            if cfg.visualization.mining.show_mined_patches and cfg.output.path:
                import os as _os

                from ..utils.visualization import show_mined_patches

                d = _os.path.join(cfg.output.path, "viz_mining")
                _os.makedirs(d, exist_ok=True)
                img = np.asarray(
                    dataloader.dataset._get_dataset_image_by_id(image_id),
                    np.float32,
                ) / 255.0
                show_mined_patches(
                    img, records,
                    save_path=_os.path.join(d, f"mined_{image_id}.png"),
                )

    logger.info(f"Hard patch mining finished in {time_since(t_start)}")
    return hardnegdata_per_imageid

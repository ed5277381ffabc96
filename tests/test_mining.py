"""Hard-patch mining: crop-box construction parity + end-to-end mining cycle."""

import numpy as np
import pytest
import torch

from reference_oracle import import_reference

import_reference()

from os2d.modeling.box_coder import BoxGridGenerator  # noqa: E402
from os2d.structures.feature_map import FeatureMapSize as RefFMS  # noqa: E402

from os2d_tpu.engine.mining import get_box_to_cut_anchor  # noqa: E402
from os2d_tpu.structures.feature_map import FeatureMapSize  # noqa: E402


@pytest.mark.parametrize(
    "img_w,img_h", [(960, 720), (400, 600), (500, 500), (300, 280)]
)
def test_get_box_to_cut_anchor_matches_reference(img_w, img_h):
    from os2d_tpu.structures.feature_map import feature_map_size_for_image

    fm = feature_map_size_for_image(FeatureMapSize(w=img_w, h=img_h))
    gen = BoxGridGenerator(
        box_size=RefFMS(w=240, h=240), box_stride=RefFMS(w=16, h=16)
    )
    crop = RefFMS(w=600, h=600)
    want_crops, want_anchors, want_idx = gen.get_box_to_cut_anchor(
        RefFMS(w=img_w, h=img_h), crop, RefFMS(w=fm.w, h=fm.h)
    )
    got_crops, got_anchors, got_idx = get_box_to_cut_anchor(
        FeatureMapSize(w=img_w, h=img_h), FeatureMapSize(w=600, h=600), fm
    )
    np.testing.assert_allclose(got_crops, want_crops.bbox_xyxy.numpy(), atol=1e-4)
    np.testing.assert_allclose(got_anchors, want_anchors.bbox_xyxy.numpy(), atol=1e-4)
    np.testing.assert_array_equal(got_idx, want_idx.numpy())


def test_mining_cycle(tmp_path):
    """mine_hard_patches -> set_hard_negative_data -> mined-crop train batch."""
    import jax
    from test_train import make_dataset

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataloader import build_train_dataloader_from_config
    from os2d_tpu.engine.mining import mine_hard_patches
    from os2d_tpu.engine.objective import ObjectiveConfig
    from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params

    rng = np.random.RandomState(0)
    dataset = make_dataset(str(tmp_path), rng)

    cfg = get_default_cfg()
    cfg.train.batch_size = 2
    cfg.train.class_batch_size = 4
    cfg.train.augment.train_patch_width = 320
    cfg.train.augment.train_patch_height = 320
    cfg.train.augment.scale_jitter = 1.0
    cfg.train.augment.jitter_aspect_ratio = 1.0
    cfg.model.class_image_size = 128
    cfg.eval.scales_of_image_pyramid = [1.0]
    cfg.train.mining.num_random_pyramid_scales = 1
    cfg.train.mining.num_random_negative_classes = 2
    cfg.train.mining.num_hard_patches_per_image = 3
    cfg.tpu.eval_class_chunk = 4

    dataloader, _ = build_train_dataloader_from_config(cfg, dataset_train=dataset)
    model_cfg = Os2dConfig(class_image_size=128)
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(1), model_cfg)

    mined = mine_hard_patches(dataloader, model, params, cfg, ObjectiveConfig())
    assert set(mined.keys()) == set(dataset.image_ids)
    roles = {r["role"] for recs in mined.values() for r in recs}
    assert "neg" in roles or "pos" in roles
    for recs in mined.values():
        for r in recs:
            assert r["crop_position_xyxy"].shape == (4,)
            assert np.isfinite(r["loss"])
            # mined crop must be the training patch size (after inverse scale)
            w = r["crop_position_xyxy"][2] - r["crop_position_xyxy"][0]
            assert w == pytest.approx(320, rel=0.05)

    # the dataloader must consume mined data and produce a training batch
    dataloader.set_hard_negative_data(mined)
    batch = dataloader.get_batch(0)
    assert batch["images"].shape[1:] == (320, 320, 3)
    # mined labels must be present in the batch class set
    mined_labels = {r["label_global"] for recs in mined.values() for r in recs}
    assert mined_labels & set(batch["class_ids"])


def test_mine_extra_class_images(tmp_path):
    """mine_extra_class_images crops every non-difficult GT box as an extra
    class view used at training time (os2d/data/dataloader.py:210-229)."""
    import numpy as np
    from test_train import make_dataset

    from os2d_tpu.data.dataloader import DataloaderOneShotDetection
    from os2d_tpu.structures.feature_map import FeatureMapSize

    rng = np.random.RandomState(0)
    dataset = make_dataset(str(tmp_path), rng)
    loader = DataloaderOneShotDetection(
        dataset=dataset, batch_size=2, class_batch_size=4,
        random_crop_size=FeatureMapSize(w=320, h=320), random_crop_scale=1.0,
        do_augmentation=True, mine_extra_class_images=True,
        class_shape_palette=[(240, 240)],
    )
    assert loader.label_image_collection
    # every class with non-difficult boxes has mined views
    assert set(loader.label_image_collection) == {0, 1}
    # batches still assemble with the mined collection active
    batch = loader.get_batch(0)
    assert batch["images"].shape[0] == 2


def test_mining_saves_patch_figures(tmp_path):
    """cfg.visualization.mining.show_mined_patches dumps per-image figures."""
    import glob

    import jax
    from test_train import make_dataset

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.data.dataloader import build_train_dataloader_from_config
    from os2d_tpu.engine.mining import mine_hard_patches
    from os2d_tpu.engine.objective import ObjectiveConfig
    from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params

    rng = np.random.RandomState(3)
    dataset = make_dataset(str(tmp_path / "data"), rng)

    cfg = get_default_cfg()
    cfg.train.batch_size = 2
    cfg.train.class_batch_size = 4
    cfg.train.augment.train_patch_width = 320
    cfg.train.augment.train_patch_height = 320
    cfg.train.augment.scale_jitter = 1.0
    cfg.train.augment.jitter_aspect_ratio = 1.0
    cfg.model.class_image_size = 128
    cfg.eval.scales_of_image_pyramid = [1.0]
    cfg.train.mining.num_random_pyramid_scales = 1
    cfg.train.mining.num_random_negative_classes = 2
    cfg.train.mining.num_hard_patches_per_image = 2
    cfg.tpu.eval_class_chunk = 4
    cfg.output.path = str(tmp_path / "out")
    cfg.visualization.mining.show_mined_patches = True

    dataloader, _ = build_train_dataloader_from_config(cfg, dataset_train=dataset)
    model_cfg = Os2dConfig(class_image_size=128)
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(1), model_cfg)
    mined = mine_hard_patches(dataloader, model, params, cfg, ObjectiveConfig())
    assert mined
    figs = glob.glob(str(tmp_path / "out" / "viz_mining" / "mined_*.png"))
    assert len(figs) == len(mined)

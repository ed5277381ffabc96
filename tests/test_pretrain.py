"""ImageNet pretraining trainer: smoke test on a synthetic image folder."""

import os

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from os2d_tpu.models.resnet import (
    import_torch_resnet_state_dict,
    init_resnet_classifier_params,
    resnet_c4_forward,
    resnet_classifier_forward,
)
from os2d_tpu.pretrain.train_imagenet import (
    ImageFolderDataset,
    export_torchvision_state_dict,
    train,
)


def make_image_folder(root, num_classes=3, per_class=4, excluded=1):
    rng = np.random.RandomState(0)
    for c in range(num_classes + excluded):
        d = os.path.join(root, f"n{c:08d}")
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            Image.fromarray(
                rng.randint(0, 255, (96, 96, 3), np.uint8)
            ).save(os.path.join(d, f"img{i}.jpeg"))
    # exclusion list
    exclude_file = os.path.join(root, "exclude.txt")
    with open(exclude_file, "w") as f:
        f.write(f"n{num_classes:08d}\n")
    return exclude_file


def test_image_folder_excludes_classes(tmp_path):
    exclude_file = make_image_folder(str(tmp_path))
    with open(exclude_file) as f:
        excluded = {l.strip() for l in f}
    ds = ImageFolderDataset(str(tmp_path), excluded)
    assert ds.num_classes == 3
    assert len(ds) == 12


def test_pretrain_short_run_and_export(tmp_path):
    exclude_file = make_image_folder(str(tmp_path / "data"))
    params = train(
        str(tmp_path / "data"),
        repmet_exclude_file=exclude_file,
        arch="resnet50",
        batch_size=4,
        epochs=1,
        steps_per_epoch=2,
        image_size=64,
        output_path=str(tmp_path / "out"),
        n_devices=2,
        log_every=1,
    )
    assert os.path.exists(tmp_path / "out" / "backbone_torchvision.pkl")

    # the exported state dict round-trips into the C4 detector backbone
    sd = export_torchvision_state_dict(params)
    c4 = import_torch_resnet_state_dict(sd, "resnet50")
    fm = resnet_c4_forward(c4, jnp.zeros((1, 64, 64, 3)))
    assert fm.shape == (1, 4, 4, 1024)


def test_classifier_forward_updates_bn_stats():
    params = init_resnet_classifier_params(jax.random.PRNGKey(0), "resnet50", 7)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
    logits, new_params = resnet_classifier_forward(params, x, train_bn=True)
    assert logits.shape == (2, 7)
    assert not np.allclose(
        np.asarray(new_params["bn1"]["mean"]), np.asarray(params["bn1"]["mean"])
    )
    # eval mode: stats unchanged
    logits2, same = resnet_classifier_forward(params, x, train_bn=False)
    assert same is params

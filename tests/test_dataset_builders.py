"""Dataset builder tests: INSTRE .mat conversion and RepMet episode pickles
exercised on synthetic source trees (the real datasets are not available)."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

import scipy.io as sio

from os2d_tpu.data.dataset import (
    build_grozi_dataset,
    build_instre_dataset,
    build_repmet_dataset,
)


def _save_img(path, rng, w=120, h=90):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(path)


def test_instre_builder_converts_mat(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "instre"
    # two S1 classes with one database image each (+ boxes in .txt, xywh)
    qim, im, gnd = [], [], []
    for ci in range(2):
        qrel = f"INSTRE-S1/{ci:02d}a_class/query.jpg"
        _save_img(str(root / qrel), rng)
        dbrel = f"INSTRE-S1/{ci:02d}a_class/db{ci}.jpg"
        _save_img(str(root / dbrel), rng)
        with open(str(root / dbrel).replace(".jpg", ".txt"), "w") as f:
            f.write("10 20 50 40\n")
        qim.append(np.array([qrel], dtype=object))
        im.append(np.array([dbrel], dtype=object))
        gnd.append(
            (np.array([[len(im)]]), np.array([[5, 5, 60, 60]]))
        )
    mat = {
        "qimlist": np.array(qim, dtype=object).reshape(1, -1),
        "imlist": np.array(im, dtype=object).reshape(1, -1),
        "gnd": np.array(gnd, dtype=[("ok", "O"), ("bbx", "O")]).reshape(1, -1),
    }
    sio.savemat(str(root / "gnd_instre.mat"), mat)

    dataset = build_instre_dataset(str(tmp_path), "instre-all", eval_scale=600,
                                   cache_images=True)
    assert dataset.num_classes == 2
    assert dataset.num_boxes == 2
    assert os.path.isfile(str(root / "classes" / "instre.csv"))
    # boxes scaled from relative xywh to absolute xyxy at the dataset size
    ann = dataset.get_image_annotation_for_imageid(dataset.image_ids[0])
    assert len(ann) == 1
    assert (ann.bbox_xyxy[0, 2] > ann.bbox_xyxy[0, 0]).all()

    # subset splits partition classes
    s1_train = build_instre_dataset(str(tmp_path), "instre-s1-train",
                                    eval_scale=600, no_image_reading=True)
    assert s1_train.num_classes <= 2


def test_repmet_episode_builder(tmp_path):
    rng = np.random.RandomState(1)
    root = tmp_path / "ImageNet-RepMet"
    ilsvrc = root / "ILSVRC"
    epi_name = "epi_inloc_in_domain_1_5_10_500"

    # source images
    _save_img(str(ilsvrc / "q0.jpg"), rng)
    _save_img(str(ilsvrc / "img0.jpg"), rng, w=200, h=150)

    swap = "/dccstor/leonidka1/data/imagenet/ILSVRC/"
    roidb = {
        "roidb": [
            {
                "image": swap + "img0.jpg",
                "flipped": False,
                "width": 200,
                "height": 150,
                "boxes": np.array([[10, 10, 100, 100]]),
                "gt_classes": np.array([7]),
            }
        ]
    }
    episode = {
        "epi_cats": [7],
        "epi_cats_names": ["class7"],
        "query_images": [swap + "img0.jpg"],
        "train_boxes": [
            (7, None, swap + "q0.jpg", np.array([5, 5, 80, 60]))
        ],
    }
    data_dir = root / "RepMet_CVPR2019_data" / "data" / "Imagenet_LOC"
    os.makedirs(str(data_dir / "episodes"), exist_ok=True)
    with open(str(data_dir / "voc_inloc_roidb.pkl"), "wb") as f:
        pickle.dump(roidb, f)
    with open(str(data_dir / "episodes" / f"{epi_name}.pkl"), "wb") as f:
        pickle.dump([episode], f)

    dataset = build_repmet_dataset(
        str(tmp_path), "imagenet-repmet-test-episode-0", eval_scale=500,
        cache_images=True,
    )
    assert dataset.num_classes == 1
    assert dataset.num_boxes == 1
    ann = dataset.get_image_annotation_for_imageid(dataset.image_ids[0])
    assert int(ann.get_field("labels")[0]) == 7


def test_grozi_builder_subsets(tmp_path):
    import pandas as pd

    rng = np.random.RandomState(2)
    root = tmp_path / "grozi"
    rows = []
    for image_id, split in [(0, "train"), (1, "train"), (2, "train"),
                            (3, "val-new-cl"), (4, "val-old-cl")]:
        _save_img(str(root / "src" / "3264" / f"{image_id}.jpg"), rng)
        rows.append(dict(imageid=image_id, imagefilename=f"{image_id}.jpg",
                         classid=image_id % 2, classfilename=f"{image_id % 2}.jpg",
                         gtbboxid=len(rows), difficult=0,
                         lx=0.1, ty=0.1, rx=0.5, by=0.5, split=split))
    for cid in (0, 1):
        _save_img(str(root / "classes" / "images" / f"{cid}.jpg"), rng)
    os.makedirs(str(root / "classes"), exist_ok=True)
    pd.DataFrame(rows).to_csv(str(root / "classes" / "grozi.csv"), index=False)

    mini = build_grozi_dataset(str(tmp_path), "grozi-train-mini", eval_scale=640,
                               no_image_reading=True)
    assert mini.num_images == 2  # first two train images only
    val_new = build_grozi_dataset(str(tmp_path), "grozi-val-new-cl",
                                  eval_scale=640, no_image_reading=True)
    assert set(val_new.gtboxframe["split"]) == {"val-new-cl"}
    val_all = build_grozi_dataset(str(tmp_path), "grozi-val-all", eval_scale=640,
                                  no_image_reading=True)
    assert set(val_all.gtboxframe["split"]) == {"val-new-cl", "val-old-cl"}

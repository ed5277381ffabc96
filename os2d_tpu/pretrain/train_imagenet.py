"""ImageNet classification pretraining for the OS2D backbone.

TPU rebuild of data/ImageNet-RepMet/pretrain/train_imagenet.py (the
reference's 431-LoC multiprocessing-DDP/NCCL torch trainer used to pretrain
ResNet101 with RepMet episode test classes excluded): same recipe —
RandomResizedCrop(224) + horizontal flip, SGD momentum 0.9, wd 1e-4, lr 0.1
stepped /10 every 30 epochs, 90 epochs, top-1/top-5 accuracy — expressed as a
single jitted train step data-parallel over a jax Mesh (gradient psum over ICI
replaces the DDP all-reduce).

The trained checkpoint exports in torchvision naming so it feeds the OS2D
init path (models/convert_* flow of the reference).
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import random
import time
from functools import partial

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
import optax

from ..models.resnet import (
    init_resnet_classifier_params,
    resnet_classifier_forward,
)
from ..parallel.mesh import DATA_AXIS, make_mesh, replicate, shard_batch
from ..utils.logger import setup_logger

IMG_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMG_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# data: ImageFolder-style host loader with RepMet class exclusion
# ---------------------------------------------------------------------------

class ImageFolderDataset:
    """train/<class_dir>/*.JPEG layout; classes sorted; exclusions applied."""

    def __init__(self, root, classes_to_exclude=(), extensions=(".jpeg", ".jpg", ".png")):
        self.root = root
        class_dirs = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)) and d not in classes_to_exclude
        )
        self.class_to_idx = {c: i for i, c in enumerate(class_dirs)}
        self.samples = []
        for c in class_dirs:
            for fname in sorted(os.listdir(os.path.join(root, c))):
                if fname.lower().endswith(extensions):
                    self.samples.append(
                        (os.path.join(root, c, fname), self.class_to_idx[c])
                    )

    def __len__(self):
        return len(self.samples)

    @property
    def num_classes(self):
        return len(self.class_to_idx)


def random_resized_crop(img, size=224, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop semantics."""
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = random.uniform(*scale) * area
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        ar = math.exp(random.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * ar)))
        ch = int(round(math.sqrt(target_area / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x = random.randint(0, w - cw)
            y = random.randint(0, h - ch)
            img = img.crop((x, y, x + cw, y + ch))
            return img.resize((size, size), Image.BILINEAR)
    # fallback: center crop
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
    return img.resize((size, size), Image.BILINEAR)


def load_train_image(path, size=224):
    with open(path, "rb") as f:
        img = Image.open(f)
        if img.mode != "RGB":
            img = img.convert("RGB")
        img.load()
    img = random_resized_crop(img, size)
    if random.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMG_MEAN) / IMG_STD


def batch_iterator(dataset, batch_size, size=224, seed=0):
    rng = random.Random(seed)
    order = list(range(len(dataset)))
    while True:
        rng.shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            idxs = order[start: start + batch_size]
            images = np.stack(
                [load_train_image(dataset.samples[i][0], size) for i in idxs]
            )
            labels = np.asarray([dataset.samples[i][1] for i in idxs], np.int32)
            yield images, labels


# ---------------------------------------------------------------------------
# train step
# ---------------------------------------------------------------------------

def make_train_step(optimizer, num_classes, compute_dtype=jnp.bfloat16):
    def loss_fn(params, images, labels):
        logits, new_params = resnet_classifier_forward(
            params, images, compute_dtype, train_bn=True
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        loss = -jnp.mean(
            jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)
        )
        top1 = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        _, top5_idx = jax.lax.top_k(logits, min(5, logits.shape[-1]))
        top5 = jnp.mean(jnp.any(top5_idx == labels[:, None], axis=1).astype(jnp.float32))
        return loss, (new_params, top1, top5)

    @jax.jit
    def step(params, opt_state, images, labels):
        (loss, (bn_params, top1, top5)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(bn_params, updates)
        return params, opt_state, {"loss": loss, "top1": top1, "top5": top5}

    return step


def export_torchvision_state_dict(params):
    """Params pytree -> torchvision-named numpy state dict (the inverse of
    import_torch_resnet_state_dict), so the pretrained backbone can init the
    detector or be shared with torch users."""
    sd = {}

    def put_norm(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])
        if "mean" in p:
            sd[prefix + ".running_mean"] = np.asarray(p["mean"])
            sd[prefix + ".running_var"] = np.asarray(p["var"])

    def t(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))

    sd["conv1.weight"] = t(params["conv1"])
    put_norm("bn1", params["bn1"])
    for layer in ("layer1", "layer2", "layer3", "layer4"):
        if layer not in params:
            continue
        for i, block in enumerate(params[layer]):
            base = f"{layer}.{i}"
            for ci in (1, 2, 3):
                sd[f"{base}.conv{ci}.weight"] = t(block[f"conv{ci}"])
                put_norm(f"{base}.bn{ci}", block[f"bn{ci}"])
            if "downsample_conv" in block:
                sd[f"{base}.downsample.0.weight"] = t(block["downsample_conv"])
                put_norm(f"{base}.downsample.1", block["downsample_bn"])
    if "fc" in params:
        sd["fc.weight"] = np.asarray(params["fc"]["w"]).T
        sd["fc.bias"] = np.asarray(params["fc"]["b"])
    return sd


def train(data_root, repmet_exclude_file=None, arch="resnet101", batch_size=256,
          epochs=90, base_lr=0.1, momentum=0.9, weight_decay=1e-4,
          image_size=224, steps_per_epoch=None, output_path="output/imagenet",
          n_devices=None, log_every=50, seed=0):
    logger = setup_logger("OS2D.pretrain")
    excluded = set()
    if repmet_exclude_file:
        with open(repmet_exclude_file) as f:
            excluded = {line.strip() for line in f if line.strip()}
        logger.info(f"Excluding {len(excluded)} RepMet test classes")

    dataset = ImageFolderDataset(data_root, excluded)
    logger.info(f"{len(dataset)} images, {dataset.num_classes} classes")
    steps_per_epoch = steps_per_epoch or len(dataset) // batch_size

    params = init_resnet_classifier_params(
        jax.random.PRNGKey(seed), arch, dataset.num_classes
    )
    schedule = optax.piecewise_constant_schedule(
        base_lr,
        {steps_per_epoch * 30: 0.1, steps_per_epoch * 60: 0.1},
    )
    optimizer = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum),
        optax.scale_by_schedule(lambda count: -schedule(count)),
    )
    opt_state = optimizer.init(params)

    mesh = make_mesh(n_devices)
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    step_fn = make_train_step(optimizer, dataset.num_classes)

    it = batch_iterator(dataset, batch_size, image_size, seed)
    t_start = time.time()
    with mesh:
        for step_i in range(epochs * steps_per_epoch):
            images, labels = next(it)
            images, labels = shard_batch(mesh, (jnp.asarray(images), jnp.asarray(labels)))
            params, opt_state, metrics = step_fn(params, opt_state, images, labels)
            if step_i % log_every == 0:
                logger.info(
                    f"step {step_i}: loss={float(metrics['loss']):.4f} "
                    f"top1={float(metrics['top1']):.4f} "
                    f"top5={float(metrics['top5']):.4f} "
                    f"({time.time() - t_start:.0f}s)"
                )
            if output_path and (step_i + 1) % steps_per_epoch == 0:
                os.makedirs(output_path, exist_ok=True)
                import pickle

                with open(os.path.join(output_path, "backbone_torchvision.pkl"), "wb") as f:
                    pickle.dump(export_torchvision_state_dict(params), f)
    return params


def main():  # pragma: no cover
    parser = argparse.ArgumentParser(description="ImageNet pretraining (TPU)")
    parser.add_argument("data", help="ImageFolder root (train split)")
    parser.add_argument("--repmet-exclude", default=None,
                        help="repmet_test_classes.txt to exclude")
    parser.add_argument("--arch", default="resnet101")
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--epochs", type=int, default=90)
    parser.add_argument("--lr", type=float, default=0.1)
    parser.add_argument("--output", default="output/imagenet")
    args = parser.parse_args()
    train(args.data, args.repmet_exclude, args.arch, args.batch_size,
          args.epochs, args.lr, output_path=args.output)


if __name__ == "__main__":  # pragma: no cover
    main()

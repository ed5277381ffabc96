"""Worker for the multi-host (pod) training test — and a reference recipe.

Each process of a jax.distributed CPU cluster runs this script; together
they form ONE global 8-device mesh (num_processes x local devices) and run
identical data-parallel train steps via the exact product path
(make_sharded_train_inputs -> TrainStep), the same SPMD shape a TPU pod
runs with cfg.tpu.distributed_init=true.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out>
Writes {"losses": [...], "grad_norms": [...]} to <out> (process 0 only
for writes-gating coverage; every process computes them).

The pytest driver (tests/test_multihost.py) compares the cluster's losses
against a single-process 8-device mesh run of `run_steps` — the physical
layout changes, the math must not.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def build_batch_and_step(n_steps=3):
    """Deterministic tiny training setup shared by cluster + reference.

    Returns (batches, params, opt_state, step): B=8 images so the batch
    shards cleanly over 8 devices, planted square patches so the loss is
    non-degenerate.
    """
    import numpy as np

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.engine.objective import ObjectiveConfig
    from os2d_tpu.engine.optimization import create_optimizer
    from os2d_tpu.engine.train import TrainStep, build_trainable_mask
    from os2d_tpu.models import Os2dConfig, init_os2d_params
    from os2d_tpu.structures.feature_map import FeatureMapSize
    import jax

    B, S, C, CS = 8, 128, 4, 64
    rng = np.random.RandomState(0)
    class_images = rng.randint(0, 255, (C, CS, CS, 3), np.uint8)

    batches = []
    for _ in range(n_steps):
        images = rng.randint(0, 60, (B, S, S, 3), np.uint8)
        gt_boxes = np.zeros((B, 8, 4), np.float32)
        gt_labels = np.full((B, 8), -1, np.int32)
        gt_valid = np.zeros((B, 8), bool)
        for i in range(B):
            cid = int(rng.randint(C))
            x0, y0 = int(rng.randint(S - CS)), int(rng.randint(S - CS))
            images[i, y0: y0 + CS, x0: x0 + CS] = class_images[cid]
            gt_boxes[i, 0] = [x0, y0, x0 + CS, y0 + CS]
            gt_labels[i, 0] = cid
            gt_valid[i, 0] = True
        batches.append({
            "images": images,
            "class_images": [class_images[c] for c in range(C)],
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels,
            "gt_difficult": np.zeros((B, 8), bool),
            "gt_valid": gt_valid,
            "img_size": FeatureMapSize(w=S, h=S),
        })

    cfg = get_default_cfg()
    cfg.train.batch_size = B
    cfg.model.class_image_size = CS
    cfg.train.optim.lr = 1e-3
    model_cfg = Os2dConfig(class_image_size=CS)
    params = init_os2d_params(jax.random.PRNGKey(1), model_cfg)
    obj_cfg = ObjectiveConfig()
    mask = build_trainable_mask(params, cfg.train)
    optimizer = create_optimizer(cfg.train.optim, mask)
    opt_state = optimizer.init(params)
    step = TrainStep(model_cfg, obj_cfg, optimizer, cfg.train)
    return batches, params, opt_state, step


def run_steps(mesh, n_steps=3):
    """The measured quantity: per-step (loss, grad_norm) of n_steps
    data-parallel updates over `mesh` via the product path."""
    import logging

    from os2d_tpu.engine.train import train_one_batch

    batches, params, opt_state, step = build_batch_and_step(n_steps)
    logger = logging.getLogger("OS2D.multihost")
    losses, grad_norms = [], []
    for batch in batches:
        params, opt_state, meters = train_one_batch(
            batch, params, opt_state, step, logger, mesh=mesh)
        losses.append(float(meters["loss"]))
        grad_norms.append(float(meters["grad_norm"]))
    return losses, grad_norms


def run_class_sharded_eval(mesh):
    """The eval leg: a class-sharded fused detection dispatch over `mesh`
    (exercises shard_classes/put_global on the cluster and the
    Evaluator._replicated output readback, which only activates when
    process_count > 1). Returns the packed detections as a numpy array."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from os2d_tpu.config import get_default_cfg
    from os2d_tpu.engine.evaluate import Evaluator
    from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params
    from os2d_tpu.models.head import ClassHead
    from os2d_tpu.structures.feature_map import FeatureMapSize

    cfg = get_default_cfg()
    cfg.tpu.eval_class_chunk = 2
    cfg.tpu.eval_pre_top_k = 128
    cfg.tpu.eval_top_k = 16

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)

    rng = np.random.RandomState(1)
    h = w = 64
    scenes = rng.randint(0, 255, (1, h, w, 3), np.uint8)
    n_cls = 8
    feats = np.zeros((n_cls, 15, 15, 1024), np.float32)
    for k in range(n_cls):
        feats[k, :, :, 200 + k] = 1.0
    mask = np.ones((n_cls, 15, 15), np.float32)
    mask /= mask.reshape(n_cls, -1).sum(1)[:, None, None]
    head = ClassHead(jnp.asarray(feats), jnp.asarray(mask))
    ev = Evaluator(model, cfg, mesh=mesh)
    return np.asarray(ev.detect_images(
        params, scenes, head, [FeatureMapSize(w=w, h=h)], [(1.0, 1.0)],
        {"mean": model_cfg.normalization_mean,
         "std": model_cfg.normalization_std}))


def main():
    pid, n_proc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    per_proc = 8 // n_proc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={per_proc}")
    import jax

    jax.config.update("jax_platforms", "cpu")  # the axon plugin ignores env
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=n_proc, process_id=pid)
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == per_proc

    from os2d_tpu.parallel import make_mesh, primary_host

    mesh = make_mesh(8)
    losses, grad_norms = run_steps(mesh)
    packed = run_class_sharded_eval(mesh)
    if primary_host():
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "grad_norms": grad_norms,
                       "eval_packed": packed.tolist()}, f)
    print(f"proc {pid}: losses={losses}", flush=True)


if __name__ == "__main__":
    main()

"""Device mesh + sharding strategy.

The reference OS2D engine is strictly single-process single-GPU
(os2d/modeling/model.py:165-167, main.py:70-72); distributed execution
appears only in its baselines via NCCL DDP. The TPU rebuild scales through
jax.sharding instead of a communication backend:

  - TRAINING: data parallelism — the image batch (and its padded GT) shard
    over the "data" mesh axis; params are replicated; XLA inserts the gradient
    all-reduce (psum) over ICI automatically when the jitted train step
    consumes sharded batch + replicated params.
  - EVAL: the embarrassingly-parallel axes are classes (hundreds to thousands
    of query classes) and pyramid scales — class feature banks shard over
    "data" so each chip correlates the image against its slice of classes;
    final top-K detections gather on the host.

There is deliberately no TP/PP/SP/EP: a 2020-era CNN detector has no long
sequence or giant weight matrices to shard (SURVEY.md §2.16); batch/class/
scale sharding saturates the hardware at this model scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def primary_host() -> bool:
    """True on the process that should own host-side writes (checkpoints,
    logs, figures) in a multi-host run; always True single-process."""
    return jax.process_index() == 0


def put_global(x, sharding):
    """device_put that also works on a multi-host (pod) mesh.

    Single-process: plain jax.device_put. Multi-process SPMD: every process
    holds the SAME full global value (the dataloaders are seeded identically
    across hosts), and make_array_from_callback assembles the global array
    by slicing each process's addressable shards out of its local copy —
    the standard JAX pod input idiom (no cross-host transfer; each host
    uploads only its own slice)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), tree)


def shard_batch(mesh: Mesh, tree):
    """Shard axis 0 of every array leaf over the data axis."""
    def put(x):
        return put_global(x, NamedSharding(mesh, P(DATA_AXIS)))

    return jax.tree_util.tree_map(put, tree)


def shard_classes(mesh: Mesh, class_feats, pool_mask):
    """Shard the class axis of the precomputed class-feature bank."""
    s = NamedSharding(mesh, P(DATA_AXIS))
    return put_global(class_feats, s), put_global(pool_mask, s)


def make_sharded_train_inputs(mesh: Mesh, params, opt_state, batch_arrays,
                              batch_axis: int = 0):
    """Distribute one train step's inputs: params/opt replicated, batch sharded.

    Per-batch arrays shard their image-batch axis over "data"; class images
    and anchors are replicated (every chip needs all classes). `batch_axis=1`
    handles K-step stacked groups ([K, B, ...] arrays, TrainStep.multi):
    the step axis replicates, the image axis shards.
    """
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    sharded = {}
    batch_keys = {"images", "gt_boxes", "gt_labels", "gt_difficult", "gt_valid"}
    spec = P(*([None] * batch_axis), DATA_AXIS)
    for k, v in batch_arrays.items():
        if k in batch_keys:
            sharded[k] = put_global(v, NamedSharding(mesh, spec))
        else:
            sharded[k] = put_global(v, NamedSharding(mesh, P()))
    return params, opt_state, sharded

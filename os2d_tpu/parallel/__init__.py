from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_classes,
    make_sharded_train_inputs,
)

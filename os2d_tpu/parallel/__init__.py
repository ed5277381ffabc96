from .mesh import (
    make_mesh,
    primary_host,
    put_global,
    replicate,
    shard_batch,
    shard_classes,
    make_sharded_train_inputs,
)

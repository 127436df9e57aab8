from .mesh import (  # noqa: F401
    data_parallel_mesh,
    make_dp_train_step,
    put_replicated,
    put_sharded,
    replicate,
    shard_batch,
)

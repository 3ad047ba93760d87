from passt_tpu.parallel.mesh import (
    make_mesh,
    param_partition_spec,
    shard_params,
    shard_batch,
    replicate,
    make_parallel_train_step,
)

__all__ = [
    "make_mesh",
    "param_partition_spec",
    "shard_params",
    "shard_batch",
    "replicate",
    "make_parallel_train_step",
]

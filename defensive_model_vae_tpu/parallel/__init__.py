from .mesh import (
    create_mesh,
    shard_batch,
    replicate,
    tensor_shard_params,
    make_parallel_train_step,
)

__all__ = [
    "create_mesh",
    "shard_batch",
    "replicate",
    "tensor_shard_params",
    "make_parallel_train_step",
]

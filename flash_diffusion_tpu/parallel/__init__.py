from .mesh import (
    batch_sharding,
    create_mesh,
    initialize_distributed,
    local_batch_slice,
    replicate,
    replicated,
    shard_batch,
    shard_params_fsdp,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "initialize_distributed",
    "local_batch_slice",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_params_fsdp",
]

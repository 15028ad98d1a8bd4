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
from .tp import shard_params_tp, tp_sharding_summary, tp_spec_for

__all__ = [
    "batch_sharding",
    "create_mesh",
    "initialize_distributed",
    "local_batch_slice",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_params_fsdp",
    "shard_params_tp",
    "tp_sharding_summary",
    "tp_spec_for",
]

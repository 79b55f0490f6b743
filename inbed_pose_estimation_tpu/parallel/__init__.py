from .mesh import (
    initialize_distributed,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "initialize_distributed",
    "batch_sharding",
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "replicated",
    "shard_batch",
]

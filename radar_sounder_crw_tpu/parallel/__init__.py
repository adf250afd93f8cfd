from .mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["make_mesh", "replicated", "batch_sharding", "shard_batch"]

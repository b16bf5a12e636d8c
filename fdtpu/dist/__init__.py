from fdtpu.dist.mesh import (
    MeshConfig,
    create_mesh,
    shard_batch,
    replicate,
    data_sharding,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
]

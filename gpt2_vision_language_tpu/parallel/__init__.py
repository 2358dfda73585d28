from .mesh import make_mesh, batch_sharding, replicated, shard_batch, local_world

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "local_world",
]

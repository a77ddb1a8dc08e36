"""L6: device mesh construction and sharding helpers."""

from rick_tpu.dist.mesh import make_mesh, shard_batch, replicate, local_batch_size

__all__ = ["make_mesh", "shard_batch", "replicate", "local_batch_size"]

"""Device-mesh / sharding helpers for data-parallel SELD training."""

from .mesh import make_mesh, shard_batch, replicate

__all__ = ["make_mesh", "shard_batch", "replicate"]

from .sharding import ShardedPoissonApply, make_device_mesh, shard_elements

__all__ = ["ShardedPoissonApply", "make_device_mesh", "shard_elements"]

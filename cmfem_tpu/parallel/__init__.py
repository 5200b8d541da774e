from .sharding import ShardedPoissonApply, make_device_mesh, shard_elements
from .ablation_sharded import ShardedAblationNewton

__all__ = [
    "ShardedPoissonApply",
    "make_device_mesh",
    "shard_elements",
    "ShardedAblationNewton",
]

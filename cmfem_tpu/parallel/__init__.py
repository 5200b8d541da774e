from .sharding import ShardedPoissonApply, make_device_mesh, shard_elements
from .ablation_sharded import ShardedAblationNewton
from .dofpart import DofPartitionedOperator

__all__ = [
    "ShardedPoissonApply",
    "make_device_mesh",
    "shard_elements",
    "ShardedAblationNewton",
    "DofPartitionedOperator",
]

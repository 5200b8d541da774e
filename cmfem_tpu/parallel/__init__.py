from .sharding import ShardedPoissonApply, make_device_mesh, shard_elements
from .ablation_sharded import ShardedAblationNewton
from .ablation_dofpart import DofPartitionedAblationNewton
from .dofpart import DofPartition, DofPartitionedOperator

__all__ = [
    "ShardedPoissonApply",
    "make_device_mesh",
    "shard_elements",
    "ShardedAblationNewton",
    "DofPartitionedAblationNewton",
    "DofPartition",
    "DofPartitionedOperator",
]

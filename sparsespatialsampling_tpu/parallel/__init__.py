from .mesh import make_mesh, default_mesh, sharding_enabled, CELL_AXIS
from .interpolate import sharded_interpolate
from .svd import distributed_rsvd
from .knn import ShardedKNNIndex

__all__ = ["make_mesh", "default_mesh", "sharding_enabled", "CELL_AXIS",
           "sharded_interpolate", "distributed_rsvd", "ShardedKNNIndex"]

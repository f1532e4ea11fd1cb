from .knn import KNNIndex
from .interpolate import interpolate_data
from . import morton

__all__ = ["KNNIndex", "interpolate_data", "morton"]

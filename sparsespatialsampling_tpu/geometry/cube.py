"""Axis-aligned rectangles (2D) / boxes (3D) as geometry objects.

Vectorized jnp re-design of the reference ``CubeGeometry``
(``sparseSpatialSampling/geometry/cube_geometry.py``).
"""
import numpy as np

from .._backend import array_namespace
from .base import GeometryObject


class CubeGeometry(GeometryObject):
    __short_description__ = "rectangles (2D) or cubes (3D)"

    def __init__(self, name: str, keep_inside: bool, lower_bound: list, upper_bound: list,
                 refine: bool = False, min_refinement_level: int = None):
        super().__init__(name, keep_inside, refine, min_refinement_level)
        self._lower_bound = list(lower_bound)
        self._upper_bound = list(upper_bound)
        self._type = "cube"
        self._check_geometry()

        self._lower = np.asarray(self._lower_bound, dtype=np.float64)
        self._upper = np.asarray(self._upper_bound, dtype=np.float64)
        self._main_width = self._compute_main_width()
        self._center = self._compute_center()

    def mask_points(self, points):
        assert points.shape[-1] == len(self._lower_bound), \
            (f"Number of dimensions of the cell does not match the number of given bounds. "
             f"Expected {points.shape[-1]} values, found {len(self._lower_bound)} for "
             f"geometry {self.name}.")
        xp = array_namespace(points)
        inside = xp.logical_and(points >= self._lower, points <= self._upper)
        return inside.all(axis=-1)

    def bounding_box(self):
        return self._lower, self._upper

    def _check_geometry(self) -> None:
        assert self._lower_bound, \
            "Found empty list for the lower bound. Please provide values for the lower bound."
        assert self._upper_bound, \
            "Found empty list for the upper bound. Please provide values for the upper bound."
        assert len(self._lower_bound) == len(self._upper_bound), \
            (f"The number of provided boundaries for the lower bound does not match the number "
             f"of boundaries for the upper bound. Found {len(self._lower_bound)} values for the "
             f"lower bound but {len(self._upper_bound)} values for the upper bound for geometry "
             f"{self.name}.")
        for i, (lo, up) in enumerate(zip(self._lower_bound, self._upper_bound)):
            assert lo < up, \
                (f"Value of {lo} for the lower bound at position {i} is larger or equal than the "
                 f"value of {up} for the upper bound for geometry {self.name}. The lower bound "
                 f"must be smaller than the upper bound!")

    @property
    def type(self) -> str:
        return self._type

    @property
    def main_width(self) -> float:
        return self._main_width

    @property
    def center(self):
        return self._center

    def _compute_main_width(self) -> float:
        return float(np.max(np.abs(self._upper - self._lower)))

    def _compute_center(self):
        return (self._lower + self._upper) / 2.0

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
            (f"Dimension mismatch for geometry {self.name}: the queried "
             f"points are {points.shape[-1]}-D but the box bounds have "
             f"{len(self._lower_bound)} components.")
        xp = array_namespace(points)
        inside = xp.logical_and(points >= self._lower, points <= self._upper)
        return inside.all(axis=-1)

    def bounding_box(self):
        return self._lower, self._upper

    def _trace_constants(self):
        return [self._lower, self._upper]

    def _check_geometry(self) -> None:
        assert self._lower_bound, \
            "The box needs a lower corner — the lower-bound list is empty."
        assert self._upper_bound, \
            "The box needs an upper corner — the upper-bound list is empty."
        assert len(self._lower_bound) == len(self._upper_bound), \
            (f"Lower and upper corner of geometry {self.name} must have the "
             f"same number of components; got {len(self._lower_bound)} vs "
             f"{len(self._upper_bound)}.")
        for i, (lo, up) in enumerate(zip(self._lower_bound, self._upper_bound)):
            assert lo < up, \
                (f"Degenerate box for geometry {self.name}: along axis {i} "
                 f"the lower bound {lo} is not strictly below the upper "
                 f"bound {up}.")

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

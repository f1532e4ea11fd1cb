"""Circles (2D) / spheres (3D) as geometry objects.

Vectorized jnp re-design of the reference ``SphereGeometry``
(``sparseSpatialSampling/geometry/sphere_geometry.py``).
"""
import numpy as np

from .base import GeometryObject


class SphereGeometry(GeometryObject):
    __short_description__ = "circles (2D) or spheres (3D)"

    def __init__(self, name: str, keep_inside: bool, position: list, radius,
                 refine: bool = False, min_refinement_level: int = None):
        super().__init__(name, keep_inside, refine, min_refinement_level)
        self._position = list(position)
        self._radius = radius
        self._type = "sphere"

        self._main_width = self._compute_main_width()
        self._center = self._compute_center()
        self._check_geometry()

    def mask_points(self, points):
        assert points.shape[-1] == len(self._position), \
            (f"Dimension mismatch for geometry {self.name}: the queried "
             f"points are {points.shape[-1]}-D but the sphere center has "
             f"{len(self._position)} components.")
        delta = points - self._center
        return (delta * delta).sum(axis=-1) <= self._radius ** 2

    def bounding_box(self):
        return self._center - self._radius, self._center + self._radius

    def _trace_constants(self):
        return [self._center, float(self._radius)]

    def _check_geometry(self) -> None:
        assert self._position, \
            "The sphere needs its center coordinates — the position list is empty."
        assert isinstance(self._radius, (int, float)), \
            (f"radius of geometry {self.name} must be a plain number; got "
             f"{type(self._radius)}.")
        assert self._radius > 0, \
            f"radius must be positive; got {self._radius}."

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
        return float(self._radius)

    def _compute_center(self):
        return np.asarray(self._position, dtype=np.float64)

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
            (f"Number of dimensions of the cell does not match the number of dimensions for "
             f"the position. Expected {points.shape[-1]} values, found {len(self._position)} "
             f"for geometry {self.name}.")
        delta = points - self._center
        return (delta * delta).sum(axis=-1) <= self._radius ** 2

    def bounding_box(self):
        return self._center - self._radius, self._center + self._radius

    def _check_geometry(self) -> None:
        assert self._position, \
            "Found empty list for the position. Please provide values for the position."
        assert isinstance(self._radius, (int, float)), \
            (f"Expected the type of radius to be Union[int, float], got {type(self._radius)} "
             f"for geometry {self.name} instead.")
        assert self._radius > 0, \
            f"Expected a radius larger than zero but found a value of {self._radius}."

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

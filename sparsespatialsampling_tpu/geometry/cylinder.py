"""Cylinders, cones and conical frusta (3D) as geometry objects.

Vectorized jnp re-design of the reference ``CylinderGeometry3D``
(``sparseSpatialSampling/geometry/cylinder_geometry.py``): inside-test via
projection onto the centerline plus cross-product normal distance, with the
local radius linearly interpolated between the two end radii.
"""
import numpy as np

from .._backend import array_namespace
from .base import GeometryObject


class CylinderGeometry3D(GeometryObject):
    __short_description__ = "cylinders, conical objects and cones (3D)"

    def __init__(self, name: str, keep_inside: bool, position, radius,
                 refine: bool = False, min_refinement_level: int = None):
        """
        :param position: ``[(x1, y1, z1), (x2, y2, z2)]`` — centers of the two
            end circles
        :param radius: single radius (constant) or two radii (conical); a cone
            has one radius equal to zero
        """
        super().__init__(name, keep_inside, refine, min_refinement_level)
        self._position = position
        self._radius = radius
        self._type = "cylinder"
        self._check_geometry()

        self._position = np.asarray(self._position, dtype=np.float64)
        self._axis = self._position[1] - self._position[0]
        self._norm = float(np.linalg.norm(self._axis))

        self._main_width = self._compute_main_width()
        self._center = self._compute_center()

    def mask_points(self, points):
        xp = array_namespace(points)
        axis = self._axis
        direction_vec = points - self._position[0]
        normal_distance = xp.linalg.norm(
            xp.cross(xp.broadcast_to(axis, direction_vec.shape), direction_vec), axis=-1
        ) / self._norm
        projection = (direction_vec * axis).sum(axis=-1) / self._norm

        within_height = xp.logical_and(projection >= 0, projection <= self._norm)

        if isinstance(self._radius, (int, float)):
            local_radius = self._radius
        else:
            local_radius = self._radius[0] + projection / self._norm * (self._radius[1] - self._radius[0])

        return xp.logical_and(within_height, normal_distance <= local_radius)

    def _trace_constants(self):
        return [self._position, np.asarray(self._radius, dtype=np.float64)]

    def bounding_box(self):
        r = max(self._radius) if isinstance(self._radius, (list, tuple)) else self._radius
        lower = np.minimum(self._position[0], self._position[1]) - r
        upper = np.maximum(self._position[0], self._position[1]) + r
        return lower, upper

    def _check_geometry(self) -> None:
        assert len(self._position) > 0, \
            "The cylinder axis needs its two end points — the position list is empty."
        assert len(self._position) == 2, \
            (f"The cylinder axis is defined by exactly 2 end points; "
             f"{len(self._position)} were given.")
        assert list(self._position[0]) != list(self._position[1]), \
            ("Both axis end points coincide — that would be a zero-length "
             "cylinder. Give two distinct points.")
        assert isinstance(self._radius, (int, float, list, tuple)), \
            (f"radius of geometry {self.name} must be a number (constant "
             f"radius) or a 2-element list/tuple (cone); got "
             f"{type(self._radius)}.")
        if isinstance(self._radius, (int, float)):
            assert self._radius > 0, \
                f"radius must be positive; got {self._radius}."
        else:
            assert len(self._radius) == 2, \
                (f"A conical frustum takes exactly 2 radii (one per axis end "
                 f"point); got {len(self._radius)}.")
            assert self._radius[0] >= 0 and self._radius[1] >= 0, \
                f"Radii cannot be negative; got {self._radius}."
            assert not (self._radius[0] == 0 and self._radius[1] == 0), \
                (f"At least one of the two radii must be positive (both zero "
                 f"would make an empty cone); got {self._radius}.")

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
        r = max(self._radius) if isinstance(self._radius, (list, tuple)) else self._radius
        return float(max(r, self._norm))

    def _compute_center(self):
        return self._position.mean(axis=0)

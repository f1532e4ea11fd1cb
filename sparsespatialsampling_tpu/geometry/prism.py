"""Axis-aligned triangular prisms (3D) as geometry objects.

Vectorized jnp re-design of the reference ``PrismGeometry3D``
(``sparseSpatialSampling/geometry/prism_geometry.py``): projection onto the
extrusion axis + 2D triangle test in the cross-section plane. Only prisms
extruded along a coordinate direction are supported (as in the reference).
"""
import numpy as np

from .._backend import array_namespace
from .base import GeometryObject
from .triangle import TriangleGeometry


class PrismGeometry3D(GeometryObject):
    __short_description__ = "triangular prisms, axis-aligned (3D)"

    def __init__(self, name: str, keep_inside: bool, positions,
                 refine: bool = False, min_refinement_level: int = None):
        """
        :param positions: two triangles ``[[p1, p2, p3], [q1, q2, q3]]`` — the
            start and end face of the prism; must be aligned along a
            coordinate direction
        """
        super().__init__(name, keep_inside, refine, min_refinement_level)
        self._positions = positions
        self._type = "prism"
        self._check_geometry()

        self._positions = [np.asarray(tri, dtype=np.float64) for tri in self._positions]
        self._axis = self._positions[1][0] - self._positions[0][0]
        self._norm = float(np.linalg.norm(self._axis))

        # the two in-plane dimensions (the axis must be a coordinate direction)
        self._dim = np.where(self._axis == 0)[0]
        assert len(self._dim) == 2, \
            "The specified triangles are not aligned along a coordinate direction."
        assert np.allclose(self._positions[0][:, self._dim], self._positions[1][:, self._dim]), \
            "The specified triangles are not aligned along a coordinate direction."

        self._triangles = [
            TriangleGeometry(f"{name}_first", keep_inside=True,
                             points=self._positions[0][:, self._dim]),
            TriangleGeometry(f"{name}_second", keep_inside=True,
                             points=self._positions[1][:, self._dim]),
        ]

        self._main_width = self._compute_main_width()
        self._center = self._compute_center()

    def _trace_constants(self):
        return list(self._positions)

    def mask_points(self, points):
        xp = array_namespace(points)
        direction_vec = points - self._positions[0][0]
        projection = (direction_vec * self._axis).sum(axis=-1) / self._norm
        within_height = xp.logical_and(projection >= 0, projection <= self._norm)
        inside_triangle = self._triangles[0].check_triangle(points[:, self._dim])
        return xp.logical_and(within_height, inside_triangle)

    def bounding_box(self):
        pts = np.concatenate(self._positions)
        return pts.min(axis=0), pts.max(axis=0)

    def _check_geometry(self) -> None:
        assert len(self._positions) > 0, \
            "The prism needs its two triangular faces — the positions list is empty."
        assert len(self._positions) == 2, \
            (f"A prism is defined by exactly 2 triangles (its end faces); "
             f"{len(self._positions)} entries were given.")
        assert all(len(tri) == 3 for tri in self._positions), \
            "Both prism faces need exactly 3 corner points each."

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
        return float(max(self._norm, max(t.main_width for t in self._triangles)))

    def _compute_center(self):
        pts = np.concatenate(self._positions)
        return pts.mean(axis=0)

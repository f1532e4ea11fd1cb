"""Arbitrary enclosed 2D polygons as geometry objects.

Vectorized jnp re-design of the reference ``GeometryCoordinates2D``
(``sparseSpatialSampling/geometry/coordinates_2d.py``): the reference calls
shapely ``Point.within(Polygon)`` per node inside a process pool; here the
inside-test is a batched even-odd ray-crossing over all ``[M, E]``
(point, edge) pairs in one fused jnp expression.
"""
import numpy as np

from .._backend import array_namespace
from .base import GeometryObject


class GeometryCoordinates2D(GeometryObject):
    __short_description__ = "2D coordinates for geometries"

    def __init__(self, name: str, keep_inside: bool, coordinates,
                 refine: bool = False, min_refinement_level: int = None):
        """
        :param coordinates: polygon boundary points ``[E, 2]``; the polygon is
            closed automatically if first != last point
        """
        super().__init__(name, keep_inside, refine, min_refinement_level)
        coords = np.asarray(coordinates, dtype=np.float64)
        assert coords.ndim == 2 and coords.shape[1] == 2, \
            (f"The polygon boundary of geometry {name} must be an [N, 2] "
             f"array of 2D points; got shape {coords.shape}.")
        # close the polygon if needed
        if not np.allclose(coords[0], coords[-1]):
            coords = np.concatenate([coords, coords[:1]], axis=0)
        self._coordinates = coords
        self._type = "coord_2D"

        self._lower_bound = coords.min(axis=0)
        self._upper_bound = coords.max(axis=0)

        self._main_width = self._compute_main_width()
        self._center = self._compute_center()
        self._check_geometry()

        # edge arrays for the vectorized crossing test
        self._x1 = coords[:-1, 0]
        self._y1 = coords[:-1, 1]
        self._x2 = coords[1:, 0]
        self._y2 = coords[1:, 1]

    def _trace_constants(self):
        return [self._coordinates]

    def mask_points(self, points):
        xp = array_namespace(points)
        x = points[:, 0:1]
        y = points[:, 1:2]
        x1, y1 = self._x1[None, :], self._y1[None, :]
        x2, y2 = self._x2[None, :], self._y2[None, :]

        # even-odd rule: count edges crossed by the ray towards +x
        straddles = (y1 > y) != (y2 > y)
        # x-coordinate where the edge crosses the horizontal line through y
        x_cross = (x2 - x1) * (y - y1) / xp.where(y2 == y1, 1.0, y2 - y1) + x1
        crossings = xp.sum(straddles & (x < x_cross), axis=1)
        return (crossings % 2) == 1

    def bounding_box(self):
        return self._lower_bound, self._upper_bound

    def _check_geometry(self) -> None:
        assert np.allclose(self._coordinates[0], self._coordinates[-1]), \
            (f"The polygon of geometry {self.name} is not closed: its first "
             f"and last coordinate must coincide.")

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
        return float(np.max(np.abs(self._upper_bound - self._lower_bound)))

    def _compute_center(self):
        return (self._lower_bound + self._upper_bound) / 2.0

"""Triangles (2D) as geometry objects.

Vectorized jnp re-design of the reference ``TriangleGeometry``
(``sparseSpatialSampling/geometry/triangle_geometry.py``): sign-of-2D-cross-
product test; points on an edge count as inside.
"""
import numpy as np

from .base import GeometryObject


class TriangleGeometry(GeometryObject):
    __short_description__ = "triangles (2D)"

    def __init__(self, name: str, keep_inside: bool, points,
                 refine: bool = False, min_refinement_level: int = None):
        super().__init__(name, keep_inside, refine, min_refinement_level)
        self._points = [np.asarray(p, dtype=np.float64) for p in points]
        self._type = "triangle"
        self._check_geometry()

        self._main_width = self._compute_main_width()
        self._center = self._compute_center()

    @staticmethod
    def _cross_product_2d(a, b):
        # 2D cross product a x b = a0*b1 - a1*b0 (b is a batch of vectors)
        return a[0] * b[:, 1] - a[1] * b[:, 0]

    def _trace_constants(self):
        return list(self._points)

    def mask_points(self, points):
        p0, p1, p2 = self._points
        d1 = self._cross_product_2d(p1 - p0, points - p0)
        d2 = self._cross_product_2d(p2 - p1, points - p1)
        d3 = self._cross_product_2d(p0 - p2, points - p0)

        has_neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
        has_pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
        return ~(has_neg & has_pos)

    def check_triangle(self, vertices):
        """Inside-test entry point for reuse by prism geometry."""
        return self.mask_points(vertices)

    def bounding_box(self):
        pts = np.stack(self._points)
        return pts.min(axis=0), pts.max(axis=0)

    def _check_geometry(self) -> None:
        assert isinstance(self._points, (list, tuple, np.ndarray)), \
            (f"The triangle corners must be given as a list/tuple/array; got "
             f"{type(self._points)}.")
        assert len(self._points) == 3, \
            f"A triangle takes exactly 3 corner points; got {len(self._points)}."
        assert all(len(p) == 2 for p in self._points), \
            "Each triangle corner needs exactly 2 components (x and y)."
        a = self._points[1] - self._points[0]
        b = self._points[2] - self._points[0]
        area = 0.5 * abs(a[0] * b[1] - a[1] * b[0])
        assert area > 0, \
            f"The area of the triangle has to be larger than zero. Found an area of {area}."

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
        lower, upper = self.bounding_box()
        return float(np.max(np.abs(upper - lower)))

    def _compute_center(self):
        return np.stack(self._points).mean(axis=0)

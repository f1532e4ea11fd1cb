"""Tetrahedra (3D) as geometry objects.

Vectorized jnp re-design of the reference ``TetrahedronGeometry3D``
(``sparseSpatialSampling/geometry/tetrahedron_geometry.py``): inward face
normals + batched dot products (the reference computes the dot products in a
per-node Python loop; here it is a single ``[M, 4]`` einsum).
"""
import numpy as np

from .._backend import array_namespace
from .base import GeometryObject


class TetrahedronGeometry3D(GeometryObject):
    __short_description__ = "tetrahedra (3D)"

    def __init__(self, name: str, keep_inside: bool, positions,
                 refine: bool = False, min_refinement_level: int = None):
        super().__init__(name, keep_inside, refine, min_refinement_level)
        self._positions = np.asarray(positions, dtype=np.float64)
        self._type = "tetrahedron"
        self._check_geometry()

        # volume check: v = 1/6 |det([positions, 1])|
        mat = np.concatenate([self._positions, np.ones((4, 1))], axis=1)
        assert abs(np.linalg.det(mat) / 6.0) > 0, \
            "Degenerate tetrahedron: the 4 vertices are coplanar (zero volume)."

        self._normals = self._compute_normals()
        self._main_width = self._compute_main_width()
        self._center = self._compute_center()

    def _compute_normals(self) -> np.ndarray:
        """Inward-pointing normals of the 4 faces, column p paired with vertex p."""
        p = self._positions
        centroid = p.mean(axis=0)
        n1 = np.cross(p[1] - p[0], p[2] - p[0])
        n2 = np.cross(p[1] - p[0], p[3] - p[0])
        n3 = np.cross(p[2] - p[0], p[3] - p[0])
        n4 = np.cross(p[2] - p[1], p[3] - p[2])
        normals = np.stack([n1, n2, n3, n4], axis=1)  # [3, 4]
        check = np.array([np.dot(centroid - p[i], normals[:, i]) for i in range(4)])
        normals[:, check < 0] *= -1
        return normals

    def _trace_constants(self):
        return [self._positions]

    def mask_points(self, points):
        xp = array_namespace(points)
        # vectors from every tet vertex to every query point: [M, 4, 3]
        vectors = points[:, None, :] - self._positions[None, :, :]
        # dots[m, p] = (points[m] - positions[p]) . normals[:, p]
        dots = xp.einsum("mpd,dp->mp", vectors, self._normals)
        return ~(dots < 0).any(axis=1)

    def check_tetrahedron(self, vertices):
        """Inside-test entry point for reuse by pyramid geometry."""
        return self.mask_points(vertices)

    def bounding_box(self):
        return self._positions.min(axis=0), self._positions.max(axis=0)

    def _check_geometry(self) -> None:
        assert self._positions.shape == (4, 3), \
            (f"A tetrahedron takes 4 vertices of 3 components each, i.e. "
             f"shape (4, 3); got {self._positions.shape}.")

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
        return float((self._positions.max(axis=0) - self._positions.min(axis=0)).max())

    def _compute_center(self):
        return self._positions.mean(axis=0)

"""Pyramids with quadrilateral base (3D) as geometry objects.

Vectorized jnp re-design of the reference ``PyramidGeometry3D``
(``sparseSpatialSampling/geometry/pyramid_geometry.py``): the pyramid is
decomposed into two tetrahedra — the apex is auto-detected as the point
farthest from the best-fit base plane, the base diagonal as the longest
pair-wise distance among base points. A point is inside if it is inside
either tetrahedron.
"""
from itertools import combinations

import numpy as np

from .._backend import array_namespace
from .base import GeometryObject
from .tetrahedron import TetrahedronGeometry3D


class PyramidGeometry3D(GeometryObject):
    __short_description__ = "pyramids with quadrilateral base (3D)"

    def __init__(self, name: str, keep_inside: bool, nodes,
                 refine: bool = False, min_refinement_level: int = None):
        """
        :param nodes: five vertices of the pyramid (4 base + 1 apex, any order)
        """
        super().__init__(name, keep_inside, refine, min_refinement_level)
        self._nodes = nodes
        self._type = "pyramid"
        self._check_geometry()
        self._nodes = np.asarray(self._nodes, dtype=np.float64)

        self._create_tetrahedrons()

        self._main_width = self._compute_main_width()
        self._center = self._compute_center()

    def _create_tetrahedrons(self) -> None:
        self._get_apex()
        self._get_main_diagonal()

        idx1 = [self._diagonal_idx[0], self._off_diagonal[0], self._diagonal_idx[1], self._apex_idx]
        idx2 = [self._diagonal_idx[1], self._off_diagonal[1], self._diagonal_idx[0], self._apex_idx]

        self._tets = [
            TetrahedronGeometry3D("tet0", self._keep_inside, self._nodes[idx1]),
            TetrahedronGeometry3D("tet1", self._keep_inside, self._nodes[idx2]),
        ]

    def _get_apex(self) -> None:
        """Apex = vertex farthest from the plane fit through the most vertices."""
        best_inliers, base_normal, base_p = 0, None, None
        for i, j, k in combinations(range(len(self._nodes)), 3):
            n = np.cross(self._nodes[j] - self._nodes[i], self._nodes[k] - self._nodes[i])
            norm = np.linalg.norm(n)
            if norm < 1e-12:  # collinear points span no plane
                continue
            n = n / norm
            inliers = int((np.abs((self._nodes - self._nodes[i]) @ n) < 1e-6).sum())
            if inliers > best_inliers:
                best_inliers, base_normal, base_p = inliers, n, self._nodes[i]

        if base_normal is None:
            raise RuntimeError("No valid plane detected: the vertices may be collinear.")

        dists = np.abs((self._nodes - base_p) @ base_normal)
        self._apex_idx = int(np.argmax(dists))

    def _get_main_diagonal(self) -> None:
        """Main diagonal = the longest pair-wise distance among the base points."""
        idx = [i for i in range(len(self._nodes)) if i != self._apex_idx]
        pts = self._nodes[idx]
        diff = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(diff, -np.inf)
        i, j = np.unravel_index(int(np.argmax(diff)), diff.shape)
        self._diagonal_idx = (idx[i], idx[j])
        self._off_diagonal = [i for i in idx if i not in self._diagonal_idx]

    def _trace_constants(self):
        return [self._nodes]

    def mask_points(self, points):
        xp = array_namespace(points)
        masks = xp.stack([tet.check_tetrahedron(points) for tet in self._tets], axis=1)
        return masks.any(axis=1)

    def bounding_box(self):
        return self._nodes.min(axis=0), self._nodes.max(axis=0)

    def _check_geometry(self) -> None:
        assert len(self._nodes) == 5, \
            (f"The pyramid must have exactly five vertices but found {len(self._nodes)} "
             f"vertices.")
        for i, v in enumerate(self._nodes):
            assert isinstance(v, (list, tuple, np.ndarray)), \
                (f"Vertex no. {i} must be a list/tuple/array of coordinates; "
                 f"got {type(v)}.")
            assert len(v) == 3, \
                (f"Vertex no. {i} needs 3 coordinate components (x, y, z); "
                 f"got {len(v)}.")

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
        return float(max(t.main_width for t in self._tets))

    def _compute_center(self):
        return np.stack([t.center for t in self._tets]).mean(axis=0)

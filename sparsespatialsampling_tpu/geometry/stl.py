"""STL files (3D) as geometry objects.

TPU-native re-design of the reference ``GeometrySTL3D``
(``sparseSpatialSampling/geometry/geometry_STL_3d.py``): the reference relies
on pyvista ``select_enclosed_points`` (VTK ray casting, per cell, inside a
process pool) and pymeshfix for repair. Here the inside-test is a *generalized
winding number* computed on device: for each query point the solid angles of
all triangles are summed (van Oosterom–Strackee), and a point is inside when
``w > 0.5``. This is exact for watertight meshes, degrades gracefully for
meshes with small holes (no repair step needed), and vectorizes perfectly —
the ``[M_points, T_triangles]`` computation maps onto the VPU in chunked
batches.

Includes a self-contained binary/ASCII STL parser and an optional
vertex-clustering decimator (``reduce_by``) so no external mesh libraries are
required.
"""
import logging
import struct

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from .base import GeometryObject

logger = logging.getLogger(__name__)

_POINT_CHUNK = 4096  # query points per device batch (bounds [chunk, T] memory)


def read_stl(path: str) -> np.ndarray:
    """Parse a binary or ASCII STL file into triangles ``[T, 3, 3]`` (float64)."""
    with open(path, "rb") as fh:
        header = fh.read(80)
        rest = fh.read()

    # binary STL: 80-byte header, uint32 triangle count, 50 bytes per triangle
    if len(rest) >= 4:
        (n_tri,) = struct.unpack("<I", rest[:4])
        if len(rest) == 4 + 50 * n_tri and not header[:5].lower().startswith(b"solid"):
            return _parse_binary(rest, n_tri)
        # some binary files do start with "solid"; trust the byte count
        if len(rest) == 4 + 50 * n_tri:
            try:
                return _parse_ascii(header + rest)
            except ValueError:
                return _parse_binary(rest, n_tri)
    return _parse_ascii(header + rest)


def _parse_binary(body: bytes, n_tri: int) -> np.ndarray:
    raw = np.frombuffer(body[4:4 + 50 * n_tri], dtype=np.uint8).reshape(n_tri, 50)
    floats = raw[:, :48].copy().view("<f4").reshape(n_tri, 4, 3)
    return floats[:, 1:4, :].astype(np.float64)  # drop the normal row


def _parse_ascii(data: bytes) -> np.ndarray:
    tokens = data.decode("ascii", errors="ignore").split()
    verts = []
    it = iter(range(len(tokens)))
    i = 0
    while i < len(tokens):
        if tokens[i] == "vertex":
            verts.append([float(tokens[i + 1]), float(tokens[i + 2]), float(tokens[i + 3])])
            i += 4
        else:
            i += 1
    verts = np.asarray(verts, dtype=np.float64)
    if len(verts) == 0 or len(verts) % 3 != 0:
        raise ValueError("Could not parse STL file as ASCII.")
    return verts.reshape(-1, 3, 3)


def write_stl(path: str, triangles: np.ndarray) -> None:
    """Write triangles ``[T, 3, 3]`` as a binary STL file."""
    tri = np.asarray(triangles, dtype=np.float32)
    n = tri.shape[0]
    normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    norms = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.where(norms == 0, 1.0, norms)
    body = np.zeros((n, 50), dtype=np.uint8)
    packed = np.concatenate([normals[:, None, :], tri], axis=1).astype("<f4")  # [n, 4, 3]
    body[:, :48] = packed.reshape(n, 48 // 4).view(np.uint8).reshape(n, 48)
    with open(path, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(struct.pack("<I", n))
        fh.write(body.tobytes())


def decimate(triangles: np.ndarray, reduce_by: float) -> np.ndarray:
    """Vertex-clustering decimation: quantize vertices onto a uniform grid and
    collapse triangles that become degenerate. The grid resolution is searched
    so the output has roughly ``(1 - reduce_by) * T`` triangles."""
    if reduce_by <= 0:
        return triangles
    target = max(16, int(round(triangles.shape[0] * (1.0 - reduce_by))))
    lo = triangles.reshape(-1, 3).min(axis=0)
    hi = triangles.reshape(-1, 3).max(axis=0)
    extent = np.where(hi - lo == 0, 1.0, hi - lo)

    best = triangles
    # bisection over the clustering resolution
    res_lo, res_hi = 2, 1024
    for _ in range(12):
        res = (res_lo + res_hi) // 2
        q = np.round((triangles - lo) / extent * res)
        snapped = lo + q / res * extent
        a, b, c = snapped[:, 0], snapped[:, 1], snapped[:, 2]
        ok = (np.linalg.norm(np.cross(b - a, c - a), axis=1) > 1e-30)
        cand = snapped[ok]
        if cand.shape[0] >= target:
            best = cand
            res_hi = res
        else:
            res_lo = res + 1
        if res_lo >= res_hi:
            break
    return best


@partial(jax.jit, static_argnames=("chunk",))
def _winding_number(points, v0, v1, v2, chunk: int = _POINT_CHUNK):
    """Generalized winding number of the mesh at each query point.

    ``points [M, 3]`` (M must be a multiple of ``chunk``), triangle vertex
    arrays ``v0/v1/v2 [T, 3]``. Returns ``[M]`` float32 winding numbers.
    """

    def one_chunk(pts):
        # [chunk, T, 3] relative vectors
        a = v0[None, :, :] - pts[:, None, :]
        b = v1[None, :, :] - pts[:, None, :]
        c = v2[None, :, :] - pts[:, None, :]
        la = jnp.linalg.norm(a, axis=-1)
        lb = jnp.linalg.norm(b, axis=-1)
        lc = jnp.linalg.norm(c, axis=-1)
        det = jnp.einsum("mtd,mtd->mt", a, jnp.cross(b, c))
        denom = (la * lb * lc
                 + jnp.einsum("mtd,mtd->mt", a, b) * lc
                 + jnp.einsum("mtd,mtd->mt", b, c) * la
                 + jnp.einsum("mtd,mtd->mt", c, a) * lb)
        omega = 2.0 * jnp.arctan2(det, denom)
        return omega.sum(axis=-1) / (4.0 * jnp.pi)

    m = points.shape[0]
    return jax.lax.map(one_chunk, points.reshape(m // chunk, chunk, 3)).reshape(m)


class GeometrySTL3D(GeometryObject):
    __short_description__ = "usage of STL files for geometries (3D)"

    def __init__(self, name: str, keep_inside: bool, path_stl_file: str,
                 refine: bool = False, min_refinement_level: int = None,
                 reduce_by=0):
        if reduce_by < 0:
            logger.warning(f"Found invalid negative value for 'reduce_by' of {reduce_by}. "
                           f"Disabling compression.")
            reduce_by = 0
        elif reduce_by >= 1:
            logger.warning(f"Found invalid value for 'reduce_by' of {reduce_by}. Compression "
                           f"factor needs to be 0 <= reduce_by < 1. Correcting to 0.99.")
            reduce_by = 0.99

        super().__init__(name, keep_inside, refine, min_refinement_level)
        self._type = "STL"
        self._pwd = path_stl_file
        self._triangles = read_stl(path_stl_file)

        if reduce_by > 0:
            self._triangles = decimate(self._triangles, reduce_by)
            reduced_path = ".".join([self._pwd.split(".stl")[0], "_reduced_by_Scube.stl"])
            logger.info(f"Saving reduced STL file to disk: {reduced_path}")
            write_stl(reduced_path, self._triangles)

        pts = self._triangles.reshape(-1, 3)
        self._lower_bound = pts.min(axis=0)
        self._upper_bound = pts.max(axis=0)

        self._main_width = self._compute_main_width()
        self._center = self._compute_center()
        self._check_geometry()

        # device-resident triangle vertex arrays in f32 (winding-number test is
        # sign-robust: f32 is plenty away from the surface)
        self._v0 = jnp.asarray(self._triangles[:, 0], dtype=jnp.float32)
        self._v1 = jnp.asarray(self._triangles[:, 1], dtype=jnp.float32)
        self._v2 = jnp.asarray(self._triangles[:, 2], dtype=jnp.float32)

    def mask_points(self, points):
        pts = jnp.asarray(points, dtype=jnp.float32)
        m = pts.shape[0]
        m_pad = -(-m // _POINT_CHUNK) * _POINT_CHUNK
        if m_pad != m:
            pts = jnp.concatenate(
                [pts, jnp.zeros((m_pad - m, 3), dtype=pts.dtype)], axis=0)
        w = _winding_number(pts, self._v0, self._v1, self._v2)[:m]
        inside = w > 0.5
        # bbox pre-filter keeps far-away points robustly outside
        in_bbox = jnp.logical_and(
            jnp.asarray(points) >= jnp.asarray(self._lower_bound),
            jnp.asarray(points) <= jnp.asarray(self._upper_bound)).all(axis=-1)
        return jnp.logical_and(inside, in_bbox)

    def bounding_box(self):
        return self._lower_bound, self._upper_bound

    def _check_geometry(self) -> None:
        assert self._triangles.shape[0] > 0, \
            f"STL file {self._pwd} contains no triangles."
        if self._triangles.shape[0] > 5e4:
            logger.warning(
                f"STL file for geometry {self.name} has {self._triangles.shape[0]} "
                f"triangles. Consider using 'reduce_by' to decimate it for faster checks.")
        # watertightness diagnostic: every edge of a closed manifold appears twice
        verts = self._triangles.reshape(-1, 3)
        _, inv = np.unique(np.round(verts, decimals=9), axis=0, return_inverse=True)
        f = inv.reshape(-1, 3)
        edges = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        if not np.all(counts == 2):
            logger.warning(
                f"STL surface for geometry {self.name} is not closed/manifold. The "
                f"winding-number inside-test degrades gracefully, but results near the "
                f"defects may be inaccurate.")

    @property
    def type(self) -> str:
        return self._type

    @property
    def main_width(self) -> float:
        return self._main_width

    @property
    def center(self):
        return self._center

    @property
    def triangles(self) -> np.ndarray:
        return self._triangles

    def _compute_main_width(self) -> float:
        return float(np.max(np.abs(self._upper_bound - self._lower_bound)))

    def _compute_center(self):
        return (self._lower_bound + self._upper_bound) / 2.0

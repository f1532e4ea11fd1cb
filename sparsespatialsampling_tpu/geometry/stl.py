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
from functools import lru_cache, partial

from .base import GeometryObject

logger = logging.getLogger(__name__)

_POINT_CHUNK = 4096  # query points per device batch (bounds [chunk, T] memory)
# near-band sweep granularity of the sign-grid mask: each exact sweep costs
# O(chunk · T), and typical epochs have only a few thousand near-band
# corners — 1024 measured ~2.2x faster than 4096 on a surface-clustered
# 16.4k-corner batch at the 51k-triangle bench scale (121 -> 55 ms);
# below 1024 the per-chunk fixed costs win back the difference
_MASK_CHUNK = 1024


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


def _omega(pts, w0, w1, w2):
    """Van Oosterom–Strackee solid-angle sum: queries ``pts [q, 3]`` against
    per-query triangle sets ``w0/w1/w2 [q, n, 3]`` → ``[q]`` winding sums
    (NOT divided by 4π)."""
    a = w0 - pts[:, None, :]
    b = w1 - pts[:, None, :]
    c = w2 - pts[:, None, :]
    la = jnp.linalg.norm(a, axis=-1)
    lb = jnp.linalg.norm(b, axis=-1)
    lc = jnp.linalg.norm(c, axis=-1)
    det = jnp.einsum("qnd,qnd->qn", a, jnp.cross(b, c))
    denom = (la * lb * lc
             + jnp.einsum("qnd,qnd->qn", a, b) * lc
             + jnp.einsum("qnd,qnd->qn", b, c) * la
             + jnp.einsum("qnd,qnd->qn", c, a) * lb)
    return (2.0 * jnp.arctan2(det, denom)).sum(axis=-1)


# fast-winding build knobs: triangle-grid capacity and the neighborhood
# radius (2 → 5^3 cells answered EXACTLY; everything farther uses the
# cluster dipole term, whose relative error at ≥2h separation is O((r/d)^2)
# — far below the 0.5 classification threshold for closed surfaces).
#
# Threshold: measured on the v5e, the EXACT broadcast sweep (no gathers,
# pure VPU math over all triangles) ran 36.8k queries x 51k triangles in
# 0.395 s warm, while the two-level structure took 7 s on the same batch —
# its pointwise triangle gathers hit the identical 12-byte-lookup wall the
# kNN kernels documented (CLAUDE.md). Exact cost is linear in T, the
# structure's is ~constant in T, so the crossover sits near 51k x 18 ≈ 900k
# triangles; 256k adds safety margin for meshes with heavier per-cell
# occupancy. At the reference's stated 5e4-triangle guidance the exact
# sweep is the fast path.
_FW_MIN_TRIS = 262144
_FW_RADIUS = 2
_FW_CHUNK = 1024


def build_fast_winding(triangles: np.ndarray) -> dict:
    """Two-level acceleration structure for the generalized winding number
    (first-order fast winding, Barill et al. 2018, re-shaped for static-shape
    TPU kernels): triangles bucketed by centroid on a uniform grid sized
    ≥ 2× the largest triangle radius; a query sums EXACT solid angles over
    its (2r+1)^3 neighborhood's triangles (one blocked gather) and the
    area-weighted normal dipole term over all other occupied clusters
    (a dense [K] sweep — K is the occupied-cell count, ~surface/h²)."""
    tris = np.asarray(triangles, dtype=np.float64)
    t_count = tris.shape[0]
    cent = tris.mean(axis=1)
    area_n = 0.5 * np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    r_tri = np.linalg.norm(tris - cent[:, None, :], axis=-1).max(axis=1)
    r_max = float(r_tri.max())

    lo = cent.min(axis=0)
    extent = np.maximum(cent.max(axis=0) - lo, 1e-12)
    # h ≥ 2·r_max keeps every triangle that can graze a neighborhood inside
    # it; the upper sweep bounds total cells (dense [cells] arrays)
    h = max(2.0 * r_max, float(extent.max()) / 256.0, 1e-12)
    while True:
        dims = np.maximum(np.ceil(extent / h).astype(np.int64) + 1, 1)
        if np.prod(dims) <= 2e6:
            break
        h *= 1.26

    cc = np.clip((cent - lo) / h, 0, dims - 1).astype(np.int64)
    flat = cc[:, 0]
    for ax in range(1, 3):
        flat = flat * dims[ax] + cc[:, ax]
    n_cells = int(np.prod(dims))
    counts = np.bincount(flat, minlength=n_cells)
    # capacity cap: pathologically clustered patches (e.g. lat-lon pole
    # fans) would otherwise blow up the per-cell width; the spill-over
    # triangles go to a global RESIDUAL list evaluated exactly for every
    # query — exactness of any subset is always admissible, and the
    # residual stays small (only the cluster tails)
    C = min(64, 1 << int(max(int(counts.max()), 2) - 1).bit_length())

    order = np.argsort(flat, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(t_count) - starts[flat[order]]
    keep = pos < C
    cell_tris = np.full((n_cells + 1, C), t_count, dtype=np.int32)
    cell_tris[flat[order][keep], pos[keep]] = order[keep].astype(np.int32)
    resid = order[~keep]
    r_pad = 1 << int(max(len(resid), 1) - 1).bit_length()
    resid_idx = np.full(r_pad, t_count, dtype=np.int32)
    resid_idx[:len(resid)] = resid

    # sentinel triangle (index T): far away and degenerate → zero solid angle
    pad_tri = np.full((1, 3, 3), 1e6, dtype=np.float64)
    tris_pad = np.concatenate([tris, pad_tri]).astype(np.float32)

    # dense occupied-cluster table for the far-field dipole sweep, built
    # from the KEPT triangles only (residuals are always summed exactly —
    # including them in a dipole would double-count)
    kept_mask = np.zeros(t_count, dtype=bool)
    kept_mask[order[keep]] = True
    flat_k, cent_k, an_k = flat[kept_mask], cent[kept_mask], area_n[kept_mask]
    cw = np.maximum(np.abs(an_k).sum(axis=1), 1e-30)
    sums = np.zeros((n_cells, 3))
    wsum = np.zeros(n_cells)
    an_sum = np.zeros((n_cells, 3))
    np.add.at(sums, flat_k, cent_k * cw[:, None])
    np.add.at(wsum, flat_k, cw)
    np.add.at(an_sum, flat_k, an_k)
    occ = np.nonzero(wsum > 0)[0]
    k_pad = 1 << int(max(len(occ), 1) - 1).bit_length()
    clus_cell = np.full((k_pad, 3), -10 ** 6, dtype=np.int32)  # never "near"
    clus_cent = np.zeros((k_pad, 3), dtype=np.float32)
    clus_an = np.zeros((k_pad, 3), dtype=np.float32)
    clus_cell[:len(occ)] = np.stack(np.unravel_index(occ, dims), axis=1)
    clus_cent[:len(occ)] = (sums[occ] / wsum[occ, None]).astype(np.float32)
    clus_an[:len(occ)] = an_sum[occ].astype(np.float32)

    return {
        "cell_tris": jnp.asarray(cell_tris),
        "v0": jnp.asarray(tris_pad[:, 0]),
        "v1": jnp.asarray(tris_pad[:, 1]),
        "v2": jnp.asarray(tris_pad[:, 2]),
        "resid": jnp.asarray(resid_idx),
        "clus_cell": jnp.asarray(clus_cell),
        "clus_cent": jnp.asarray(clus_cent),
        "clus_an": jnp.asarray(clus_an),
        "origin": jnp.asarray(lo, dtype=jnp.float32),
        "inv_h": jnp.float32(1.0 / h),
        "dims": jnp.asarray(dims, dtype=jnp.int32),
    }


def _fw_offsets():
    rng = np.arange(-_FW_RADIUS, _FW_RADIUS + 1)
    offs = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    return jnp.asarray(offs, dtype=jnp.int32)


def _fw_one_chunk(pts, cell_tris, v0, v1, v2, resid, clus_cell, clus_cent,
                  clus_an, origin, inv_h, dims, offs):
    """One query chunk of the two-level fast winding number: near field +
    residual exact, far field first-order dipole."""
    q = pts.shape[0]
    n_cells_total = cell_tris.shape[0]
    rv0, rv1, rv2 = v0[resid], v1[resid], v2[resid]                # [R, 3]
    cc = jnp.floor((pts - origin) * inv_h).astype(jnp.int32)       # [q, 3]
    nb = cc[:, None, :] + offs[None, :, :]                         # [q, R, 3]
    valid = jnp.logical_and(nb >= 0, nb < dims[None, None, :]).all(-1)
    flat = nb[..., 0]
    for ax in range(1, 3):
        flat = flat * dims[ax] + nb[..., ax]
    flat = jnp.where(valid, flat, n_cells_total - 1)
    cand = cell_tris[flat].reshape(q, -1)                          # [q, R·C]
    w_near = _omega(pts, v0[cand], v1[cand], v2[cand])
    w_resid = _omega(pts,
                     jnp.broadcast_to(rv0, (q,) + rv0.shape),
                     jnp.broadcast_to(rv1, (q,) + rv1.shape),
                     jnp.broadcast_to(rv2, (q,) + rv2.shape))
    # far-field: all occupied clusters OUTSIDE the exact neighborhood
    near = (jnp.abs(clus_cell[None, :, :] - cc[:, None, :])
            <= _FW_RADIUS).all(-1)                                 # [q, K]
    dvec = clus_cent[None, :, :] - pts[:, None, :]                 # [q, K, 3]
    d2 = jnp.sum(dvec * dvec, axis=-1)
    d3 = jnp.maximum(d2, 1e-20) * jnp.sqrt(jnp.maximum(d2, 1e-20))
    dip = jnp.einsum("qkd,kd->qk", dvec, clus_an) / d3
    w_far = jnp.where(near, 0.0, dip).sum(axis=-1)
    return (w_near + w_resid + w_far) / (4.0 * jnp.pi)


@partial(jax.jit, static_argnames=("chunk",))
def _fast_winding(points, cell_tris, v0, v1, v2, resid, clus_cell,
                  clus_cent, clus_an, origin, inv_h, dims,
                  chunk: int = _FW_CHUNK):
    """Fast winding number: ``points [M, 3]`` (M a multiple of ``chunk``) →
    ``[M]`` float32."""
    offs = _fw_offsets()

    def one_chunk(pts):
        return _fw_one_chunk(pts, cell_tris, v0, v1, v2, resid, clus_cell,
                             clus_cent, clus_an, origin, inv_h, dims, offs)

    m = points.shape[0]
    return jax.lax.map(one_chunk,
                       points.reshape(m // chunk, chunk, 3)).reshape(m)


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


# --------------------------------------------------------------------- #
# voxel sign grid: O(1) inside-tests away from the surface              #
# --------------------------------------------------------------------- #
# Refinement evaluates winding numbers for EVERY new cell's corner nodes
# each epoch, and both exact paths are O(T) per query — at the reference's
# 5e4-triangle guidance (geometry_STL_3d.py:161-166) the STL check dominated
# the whole refinement wall.  But almost all of those queries sit far from
# the surface, where the answer is constant per voxel.  The sign grid
# classifies every voxel ONCE at construction (far voxels by the cluster
# dipole, the free shell by flood fill) so a query costs one int8 gather;
# only the thin near-surface band falls through to exact winding, and a
# whole query chunk skips the exact sweep via lax.cond when none of its
# queries are in the band.
_SG_MAX_VOX = 2_000_000
_SG_SEED_CD = 3      # seeds: Chebyshev ≥ _SG_SEED_CD+1 voxels from occupancy
_SG_CHUNK = 8192


def _dilate_box(a: np.ndarray) -> np.ndarray:
    """One-step 26-connectivity (Chebyshev) box dilation of a 3D bool array
    (separable per axis, no wraparound)."""
    for ax in range(3):
        out = a.copy()
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[ax] = slice(1, None)
        sl_hi[ax] = slice(None, -1)
        out[tuple(sl_lo)] |= a[tuple(sl_hi)]
        out[tuple(sl_hi)] |= a[tuple(sl_lo)]
        a = out
    return a


@partial(jax.jit, static_argnames=("chunk",))
def _dipole_winding(points, clus_cent, clus_an, chunk: int = _SG_CHUNK):
    """First-order (cluster dipole) winding estimate — the same far-field
    term ``_fw_one_chunk`` uses beyond 2h separation (error O((r/d)^2),
    Barill et al. 2018); valid here because callers only pass points
    ≥ ~2.5h from every triangle."""

    def one_chunk(pts):
        dvec = clus_cent[None, :, :] - pts[:, None, :]
        d2 = jnp.sum(dvec * dvec, axis=-1)
        d3 = jnp.maximum(d2, 1e-20) * jnp.sqrt(jnp.maximum(d2, 1e-20))
        dip = jnp.einsum("qkd,kd->qk", dvec, clus_an) / d3
        return dip.sum(axis=-1) / (4.0 * jnp.pi)

    m = points.shape[0]
    return jax.lax.map(one_chunk,
                       points.reshape(m // chunk, chunk, 3)).reshape(m)


def build_sign_grid(triangles: np.ndarray) -> dict:
    """Per-voxel inside/outside classification of the space around an STL
    surface. Returns int8 ``state`` per voxel: 0 = outside, 1 = inside,
    2 = near-surface (query needs exact winding).

    Voxels are sized so a triangle reaches at most one voxel beyond its
    centroid's (``h ≥ 2·r_max``): any voxel NOT 26-adjacent to a
    centroid-occupied voxel is surface-free, hence uniformly inside or
    outside.  Far free voxels (Chebyshev ≥ ``_SG_SEED_CD+1`` from occupancy,
    i.e. ≥ ~2.5h from any triangle) are classified by the cluster-dipole
    winding sum in one device call; the remaining free shell inherits its
    sign by flood fill through face-adjacent free voxels — a path between
    face-adjacent surface-free voxels provably cannot cross the surface.
    Free voxels unreachable from any seed (e.g. gaps narrower than ~5
    voxels between two surfaces) stay ``2`` and fall back to exact
    evaluation, so approximation never affects correctness-critical bands."""
    tris = np.asarray(triangles, dtype=np.float64)
    cent = tris.mean(axis=1)
    area_n = 0.5 * np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    r_max = float(np.linalg.norm(tris - cent[:, None, :], axis=-1).max())
    lo_c = cent.min(axis=0)
    extent = np.maximum(cent.max(axis=0) - lo_c, 1e-12)
    h = max(2.0 * r_max, float(extent.max()) / 256.0, 1e-12)
    while np.prod(np.ceil(extent / h).astype(np.int64) + 3) > _SG_MAX_VOX:
        h *= 1.26
    dims = np.ceil(extent / h).astype(np.int64) + 3   # +1 round, +2 pad rings
    origin = lo_c - h

    cc = np.floor((cent - origin) / h).astype(np.int64)
    occ3 = np.zeros(dims, dtype=bool)
    occ3[cc[:, 0], cc[:, 1], cc[:, 2]] = True
    band = _dilate_box(occ3)                    # voxels a triangle can touch
    nearz = band
    for _ in range(_SG_SEED_CD - 1):
        nearz = _dilate_box(nearz)
    seeds3 = ~_dilate_box(nearz)                # cd ≥ _SG_SEED_CD+1 from occ

    # per-occupied-voxel dipole clusters (area-weighted centroid + summed
    # area normals — aggregates only, no triangle capacity cap needed)
    n_vox = int(np.prod(dims))
    flat = (cc[:, 0] * dims[1] + cc[:, 1]) * dims[2] + cc[:, 2]
    cw = np.maximum(np.abs(area_n).sum(axis=1), 1e-30)
    sums = np.zeros((n_vox, 3))
    wsum = np.zeros(n_vox)
    an_sum = np.zeros((n_vox, 3))
    np.add.at(sums, flat, cent * cw[:, None])
    np.add.at(wsum, flat, cw)
    np.add.at(an_sum, flat, area_n)
    occ_ids = np.nonzero(wsum > 0)[0]
    k_pad = 1 << int(max(len(occ_ids), 1) - 1).bit_length()
    clus_cent = np.full((k_pad, 3), 1e6, dtype=np.float32)
    clus_an = np.zeros((k_pad, 3), dtype=np.float32)
    clus_cent[:len(occ_ids)] = sums[occ_ids] / wsum[occ_ids, None]
    clus_an[:len(occ_ids)] = an_sum[occ_ids]

    # classify the far seeds with ONE chunked device sweep
    state3 = np.full(tuple(dims), 2, dtype=np.int8)
    seed_idx = np.nonzero(seeds3.ravel())[0]
    if seed_idx.size:
        si = np.stack(np.unravel_index(seed_idx, dims), axis=1)
        pts = (origin + (si + 0.5) * h).astype(np.float32)
        m_pad = max(_SG_CHUNK,
                    1 << int(len(pts) - 1).bit_length())  # pow2 → few shapes
        if m_pad != len(pts):
            pts = np.concatenate(
                [pts, np.full((m_pad - len(pts), 3), 1e6, np.float32)])
        w = np.asarray(_dipole_winding(
            jnp.asarray(pts), jnp.asarray(clus_cent),
            jnp.asarray(clus_an)))[:seed_idx.size]
        state3.ravel()[seed_idx] = (w > 0.5).astype(np.int8)

    # flood-fill the free shell between seeds and band (6-connectivity:
    # band voxels carry 2 and never propagate; min() is conflict-free since
    # a connected free region has one sign)
    free = ~band
    for _ in range(64):
        unknown = free & (state3 == 2)
        if not unknown.any():
            break
        best = np.full(tuple(dims), 2, dtype=np.int8)
        for ax in range(3):
            sl_lo = [slice(None)] * 3
            sl_hi = [slice(None)] * 3
            sl_lo[ax] = slice(1, None)
            sl_hi[ax] = slice(None, -1)
            np.minimum(best[tuple(sl_lo)], state3[tuple(sl_hi)],
                       out=best[tuple(sl_lo)])
            np.minimum(best[tuple(sl_hi)], state3[tuple(sl_lo)],
                       out=best[tuple(sl_hi)])
        adopt = unknown & (best < 2)
        if not adopt.any():
            break
        state3[adopt] = best[adopt]

    # ---- fine level: AABB-rasterized occupancy shrinks the near band ----
    # The coarse band is (occupied ∪ 1-ring) at h ≥ 2·r_max — physically
    # ~4h thick, and surface refinement clusters most epoch corners inside
    # it, each paying the exact O(T) winding sweep.  A finer grid whose
    # occupancy marks every voxel a triangle's AABB touches needs NO
    # dilation (the surface lies inside the union of triangle AABBs, so a
    # face shared by two free voxels is provably not crossed), so the band
    # thins to ~(max triangle extent + h_f).  Signs come free: any fine
    # voxel whose center lies in a DECIDED coarse voxel inherits that
    # proven sign; the rest (free fine voxels under the coarse band) flood-
    # fill from them.  Measured on the 51k-triangle bench sphere this cuts
    # near-band epoch corners ~5x and the per-epoch geometry wall ~3x.
    tri_lo = tris.min(axis=1)
    tri_hi = tris.max(axis=1)
    max_ext = float((tri_hi - tri_lo).max())
    h_f = max(float(extent.max()) / 124.0, max_ext / 6.0, 1e-12)
    while np.prod(np.ceil(extent / h_f).astype(np.int64) + 3) > _SG_MAX_VOX:
        h_f *= 1.26
    if h_f < 0.5 * h:  # only pays when meaningfully finer than the coarse grid
        dims_f = np.ceil(extent / h_f).astype(np.int64) + 3
        origin_f = lo_c - h_f
        lo_v = np.clip(np.floor((tri_lo - origin_f) / h_f).astype(np.int64),
                       0, dims_f - 1)
        hi_v = np.clip(np.floor((tri_hi - origin_f) / h_f).astype(np.int64),
                       0, dims_f - 1)
        span = hi_v - lo_v
        occ_f = np.zeros(tuple(dims_f), dtype=bool)
        smax = span.max(axis=0)
        for dx in range(int(smax[0]) + 1):
            mx = span[:, 0] >= dx
            for dy in range(int(smax[1]) + 1):
                mxy = mx & (span[:, 1] >= dy)
                for dz in range(int(smax[2]) + 1):
                    m = mxy & (span[:, 2] >= dz)
                    if m.any():
                        occ_f[lo_v[m, 0] + dx, lo_v[m, 1] + dy,
                              lo_v[m, 2] + dz] = True

        # inherit decided coarse signs at each fine voxel center
        def axis_map(n_f, ax):
            c = origin_f[ax] + (np.arange(n_f) + 0.5) * h_f
            return np.clip(np.floor((c - origin[ax]) / h).astype(np.int64),
                           0, dims[ax] - 1)
        ix, iy, iz = (axis_map(dims_f[0], 0), axis_map(dims_f[1], 1),
                      axis_map(dims_f[2], 2))
        state_f = state3[ix[:, None, None], iy[None, :, None],
                         iz[None, None, :]].copy()
        state_f[occ_f] = 2

        # fine flood fill of free voxels still unknown (under the coarse
        # band) — same conflict-free min-propagation as the coarse fill
        free_f = ~occ_f
        for _ in range(64):
            unknown = free_f & (state_f == 2)
            if not unknown.any():
                break
            best = np.full(tuple(dims_f), 2, dtype=np.int8)
            for ax in range(3):
                sl_lo = [slice(None)] * 3
                sl_hi = [slice(None)] * 3
                sl_lo[ax] = slice(1, None)
                sl_hi[ax] = slice(None, -1)
                np.minimum(best[tuple(sl_lo)], state_f[tuple(sl_hi)],
                           out=best[tuple(sl_lo)])
                np.minimum(best[tuple(sl_hi)], state_f[tuple(sl_lo)],
                           out=best[tuple(sl_hi)])
            adopt = unknown & (best < 2)
            if not adopt.any():
                break
            state_f[adopt] = best[adopt]

        state3, origin, h, dims = state_f, origin_f, h_f, dims_f
        n_vox = int(np.prod(dims))

    n_near = int((state3 == 2).sum())
    return {"state": jnp.asarray(state3.ravel()),
            "origin": jnp.asarray(origin, dtype=jnp.float32),
            "inv_h": jnp.float32(1.0 / h),
            "dims": jnp.asarray(dims, dtype=jnp.int32),
            "n_near_vox": n_near, "n_vox": n_vox}


@lru_cache(maxsize=None)
def _make_sign_mask_fn(use_fw: bool, chunk: int):
    """Jitted inside-test routed through the sign grid: one int8 gather per
    query; only near-surface-band queries pay exact winding.

    Cached on ``(use_fw, chunk)`` — the closure captures nothing else, all
    tables arrive as call arguments, so the jitted executable is shared
    across STL instances and runs in one process (a fresh ``jax.jit``
    object would reload the program onto the device each run, ~0.4 s over
    the tunnel).

    Near-band points are COMPACTED to a prefix (stable argsort, ascending
    index among equals) before the exact sweeps, so the call runs
    ``ceil(n_near / chunk)`` sweeps instead of one per any-near chunk —
    refinement clusters cells around the surface, which used to put at
    least one near point in almost every chunk and force the O(chunk·T)
    sweep on all of them (measured ~83 ms per 16k-corner epoch at the 5e4-
    triangle guidance scale; typical epochs have only a few hundred
    near-band corners).  Per-point winding values are bitwise identical to
    the unpacked form (same triangle summation order per point)."""
    offs = _fw_offsets() if use_fw else None

    def exact_w(p, exact):
        if use_fw:
            return _fw_one_chunk(p, *exact, offs)
        v0, v1, v2 = exact
        q = p.shape[0]
        return _omega(p,
                      jnp.broadcast_to(v0[None], (q,) + v0.shape),
                      jnp.broadcast_to(v1[None], (q,) + v1.shape),
                      jnp.broadcast_to(v2[None], (q,) + v2.shape)
                      ) / (4.0 * jnp.pi)

    def fn(pts, state, origin, inv_h, dims, *exact):
        m = pts.shape[0]
        cc = jnp.floor((pts - origin) * inv_h).astype(jnp.int32)
        inb = jnp.logical_and(cc >= 0, cc < dims[None, :]).all(-1)
        ccl = jnp.clip(cc, 0, dims[None, :] - 1)
        flat = (ccl[:, 0] * dims[1] + ccl[:, 1]) * dims[2] + ccl[:, 2]
        st = jnp.where(inb, state[flat], jnp.int8(0))
        near = st == jnp.int8(2)

        perm = jnp.argsort(jnp.where(near, 0, 1).astype(jnp.int8),
                           stable=True)
        spts = pts[perm]
        n_near = near.sum()

        def one_chunk(j_p):
            j, p = j_p
            return jax.lax.cond(
                n_near > j * chunk, lambda p: exact_w(p, exact),
                lambda p: jnp.zeros(p.shape[0], jnp.float32), p)

        nchunks = m // chunk
        w_s = jax.lax.map(
            one_chunk,
            (jnp.arange(nchunks), spts.reshape(nchunks, chunk, 3))
        ).reshape(m)
        w = jnp.zeros(m, jnp.float32).at[perm].set(w_s, unique_indices=True)
        return jnp.where(near, w > 0.5, st == jnp.int8(1))

    return jax.jit(fn)


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
        # above _FW_MIN_TRIS the O(M·T) exact sweep dominates refinement
        # epochs; the two-level fast-winding structure answers the near
        # field exactly and the far field by cluster dipoles
        self._fw = (build_fast_winding(self._triangles)
                    if self._triangles.shape[0] >= _FW_MIN_TRIS else None)
        # voxel sign grid: answers queries away from the surface with one
        # int8 gather; only the near-surface band pays an exact sweep
        self._sg = build_sign_grid(self._triangles)
        logger.info(
            f"STL sign grid for geometry {name}: "
            f"{self._sg['n_near_vox']}/{self._sg['n_vox']} voxels need "
            f"exact winding evaluation.")
        use_fw = self._fw is not None
        self._mask_chunk = _FW_CHUNK if use_fw else _MASK_CHUNK
        if use_fw:
            fw = self._fw
            self._exact_args = (fw["cell_tris"], fw["v0"], fw["v1"],
                                fw["v2"], fw["resid"], fw["clus_cell"],
                                fw["clus_cent"], fw["clus_an"], fw["origin"],
                                fw["inv_h"], fw["dims"])
        else:
            self._exact_args = (self._v0, self._v1, self._v2)
        # cached jitted callable (rebuilding it per call would re-trace);
        # all arrays are passed as arguments, never closed over
        self._mask_fn = _make_sign_mask_fn(use_fw, self._mask_chunk)
        # total device-table footprint: a traced mask_points references the
        # sign grid + exact-winding tables, so an OUTER jit would bake this
        # many bytes into its HLO as constants — the engine compares it
        # against its fusion budget (``engine/tree._FUSED_GEO_BYTES``)
        self._device_table_bytes = int(
            sum(int(v.nbytes) for v in self._sg.values()
                if hasattr(v, "nbytes"))
            + sum(int(a.nbytes) for a in self._exact_args))

    def mask_points(self, points):
        chunk = self._mask_chunk
        pts = jnp.asarray(points, dtype=jnp.float32)
        m = pts.shape[0]
        m_pad = -(-m // chunk) * chunk
        if m_pad != m:
            # pad far outside the grid: padding must never register as
            # near-surface, or it would force exact sweeps on its chunk
            pts = jnp.concatenate(
                [pts, jnp.full((m_pad - m, 3), 1e6, dtype=pts.dtype)], axis=0)
        inside = self._mask_fn(pts, self._sg["state"], self._sg["origin"],
                               self._sg["inv_h"], self._sg["dims"],
                               *self._exact_args)[:m]
        # bbox pre-filter keeps far-away points robustly outside
        in_bbox = jnp.logical_and(
            jnp.asarray(points) >= jnp.asarray(self._lower_bound),
            jnp.asarray(points) <= jnp.asarray(self._upper_bound)).all(axis=-1)
        return jnp.logical_and(inside, in_bbox)

    def bounding_box(self):
        return self._lower_bound, self._upper_bound

    def _trace_constants(self):
        # every mask structure (sign grid, fast-winding tables, bbox) is a
        # deterministic function of the (possibly decimated) triangle soup
        return [self._triangles]

    # the cached jitted mask callable is a local closure — rebuild it on
    # unpickle instead of serializing it (checkpoints pickle the whole
    # facade object, reference ``sparse_spatial_sampling.py:146``)
    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_mask_fn", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._mask_fn = _make_sign_mask_fn(self._fw is not None,
                                           self._mask_chunk)

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
    def device_table_bytes(self) -> int:
        return self._device_table_bytes

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

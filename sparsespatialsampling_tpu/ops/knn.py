"""Exact k-nearest-neighbor search and inverse-distance interpolation on TPU.

This is the #1 hot primitive of the framework: it replaces both sklearn
KD-trees of the reference — ``KNeighborsRegressor`` driving the refinement
(``sparseSpatialSampling/s_cube.py:161-163``, ``:224``, ``:328``) and
``NearestNeighbors`` driving the export interpolation
(``sparseSpatialSampling/export.py:119-120``, ``:423-429``).

Design (TPU-first): the k-NN is computed as a *tiled brute-force* search whose
inner loop is a matmul. For a query tile ``q [TQ, d]`` against a point tile
``p [TN, d]`` the squared distance is ``|q|² + |p|² − 2 q·pᵀ``; since ``|q|²``
is constant per query it does not affect the ranking, so the ranking score is
``|p|² − 2 q·pᵀ`` — one MXU matmul plus a broadcast add. A running top-k is
merged tile by tile with ``lax.top_k``. This is *exact* (unlike bucketed
approximate k-NN) which keeps captured-metric parity with the reference's
KD-tree. Exact distances for the selected neighbors are recomputed directly
(``|q − p|``), avoiding the catastrophic cancellation of the expanded form.

Dispatch discipline (the tunnel-latency lesson): every public entry point is
ONE fused jitted call — search + weights + regression — so a refinement
iteration costs a single host↔device round trip.  Query counts are padded to
power-of-two buckets so the number of distinct compiled shapes over a whole
run is logarithmic, and compiled executables are persisted across processes
via the JAX compilation cache (see ``_backend.enable_compilation_cache``).
"""
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .._backend import enable_compilation_cache
from .transfer import packed_readback

enable_compilation_cache()

DEFAULT_TILE_N = 16384
DEFAULT_TILE_Q = 1024
# Max queries per device call. Empirically, single programs around ~590k
# queries crash the remote TPU worker while ~295k survive (bisected on a
# 1M-point cloud); 16k per call keeps a wide margin and bounds per-call
# latency so chunks pipeline through JAX async dispatch. Live score memory
# is one [tile_q, tile_n] buffer regardless (lax.map is sequential).
MAX_QUERY_CHUNK = 16384


def _search(queries, points, points_sq, k: int, tile_n: int, tile_q: int):
    """Top-k over pre-padded inputs (traced helper; not jitted itself).

    ``queries [Q, d]`` with Q a multiple of ``tile_q``; ``points [N, d]`` and
    ``points_sq [N]`` with N a multiple of ``tile_n`` (padding rows must have
    ``points_sq = +inf``). Returns ``(sq_dists [Q, k], idx [Q, k])``.
    """
    n = points.shape[0]
    n_tiles = n // tile_n
    points_t = points.T  # [d, N]
    # select k+slack by the fast expansion-form score, then re-rank the
    # widened set by the plain delta-sum distance: the expansion form
    # |p|^2 - 2 q.p rounds ~1e-6 worse than the direct form, and near-ties
    # below that error flipped the k-boundary selection between this path
    # and the bucket-grid kernels (which use the same recipe) — with both
    # paths ranking by the identical plain-f32 distance of identical f32
    # inputs, grid and full scan are bitwise identical even at ties
    kk = min(k + 8, n)
    # candidate-buffer strategy: collect each tile's local top-k and merge
    # ONCE at the end (1 top_k per tile instead of 2) while the buffer
    # [tile_q, n_tiles·kk] stays small; fall back to a running merge for
    # clouds with many tiles
    collect = n_tiles * kk <= 8192

    def tile_topk(q, tile_idx):
        p_t = jax.lax.dynamic_slice_in_dim(points_t, tile_idx * tile_n, tile_n, axis=1)
        p_sq = jax.lax.dynamic_slice_in_dim(points_sq, tile_idx * tile_n, tile_n)
        # ranking score: |p|^2 - 2 q.p  (monotone in true distance per query)
        scores = p_sq[None, :] - 2.0 * jnp.dot(q, p_t, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        top_s, top_i = jax.lax.top_k(-scores, kk)  # [tile_q, kk]
        return top_s, top_i + tile_idx * tile_n

    def per_q_chunk(q):
        if collect:
            def scan_tile(_, tile_idx):
                return None, tile_topk(q, tile_idx)
            _, (all_s, all_i) = jax.lax.scan(
                scan_tile, None, jnp.arange(n_tiles, dtype=jnp.int32))
            # [n_tiles, tile_q, k] → [tile_q, n_tiles*k] → final top-k
            all_s = jnp.moveaxis(all_s, 0, 1).reshape(q.shape[0], -1)
            all_i = jnp.moveaxis(all_i, 0, 1).reshape(q.shape[0], -1)
            best_scores, sel = jax.lax.top_k(all_s, kk)
            best_idx = jnp.take_along_axis(all_i, sel, axis=1)
        else:
            def scan_tile(carry, tile_idx):
                best_scores, best_idx = carry
                top_s, top_i = tile_topk(q, tile_idx)
                merged_s = jnp.concatenate([best_scores, top_s], axis=1)
                merged_i = jnp.concatenate([best_idx, top_i], axis=1)
                new_s, sel = jax.lax.top_k(merged_s, kk)
                new_i = jnp.take_along_axis(merged_i, sel, axis=1)
                return (new_s, new_i), None

            init = (jnp.full((q.shape[0], kk), -jnp.inf, dtype=jnp.float32),
                    jnp.zeros((q.shape[0], kk), dtype=jnp.int32))
            (best_scores, best_idx), _ = jax.lax.scan(
                scan_tile, init, jnp.arange(n_tiles, dtype=jnp.int32))

        # exact distances for the widened candidate set (stable
        # formulation), canonical (sq, idx) re-rank, keep k
        nb = points[best_idx]  # [tile_q, kk, d]
        delta = q[:, None, :] - nb
        sq = jnp.sum(delta * delta, axis=-1)
        sq, best_idx = _sort_neighbors(sq, best_idx)
        return sq[:, :k], best_idx[:, :k]

    qq = queries.reshape(-1, tile_q, queries.shape[-1])
    sq, idx = jax.lax.map(per_q_chunk, qq)
    return sq.reshape(-1, k), idx.reshape(-1, k)


@jax.jit
def _pack_i32(*arrs):
    """Pack same-row-count device arrays into ONE int32 matrix so a chunked
    kernel's outputs cross the link in a single transfer (each separate
    ``np.asarray`` pays a full tunnel round trip).  f32 columns travel as
    raw bits; everything else is cast to int32."""
    cols = []
    for a in arrs:
        if a.ndim == 1:
            a = a[:, None]
        if a.dtype == jnp.float32:
            a = jax.lax.bitcast_convert_type(a, jnp.int32)
        else:
            a = a.astype(jnp.int32)
        cols.append(a)
    return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


@jax.jit
def _pack_idx_delta(idx, ok):
    """Delta-compress a ``[n, k]`` int32 neighbor-index block for readback.

    Neighbors of one query cluster in the Morton-sorted point order, so
    ``idx - min(idx)`` almost always fits in uint16.  Rows travel as
    ``[base | k/2 packed u16 pairs | flags]`` int32 lanes — 4+2k+4 bytes
    instead of 4k+4, and the low-entropy delta lanes also move faster
    through the tunnel than raw indices.  ``flags`` bit0 = kernel-exact
    (``ok``), bit1 = deltas fit (rows with bit1 clear need a raw fixup
    gather; measured ~12 % worst-case on uniform clouds, far less on the
    clustered export queries)."""
    k = idx.shape[1]
    base = idx.min(axis=1)
    delta = idx - base[:, None]
    fits = (delta < 65536).all(axis=1)
    d = jnp.where(fits[:, None], delta, 0).astype(jnp.uint32)
    if k % 2:
        d = jnp.concatenate([d, jnp.zeros_like(d[:, :1])], axis=1)
    pairs = d[:, 0::2] | (d[:, 1::2] << 16)
    flags = ok.astype(jnp.int32) | (fits.astype(jnp.int32) << 1)
    return jnp.concatenate(
        [base[:, None],
         jax.lax.bitcast_convert_type(pairs, jnp.int32),
         flags[:, None]], axis=1)


@partial(jax.jit, static_argnames=("p",))
def _take_rows_pad(arr, rows, p: int):
    """Row gather with a pow2-padded row list (bounds compiled shapes)."""
    r = jnp.zeros(p, jnp.int32).at[:rows.shape[0]].set(rows)
    return jnp.take(arr, r, axis=0)


def _unpack_idx_delta(rows, k: int):
    """Host inverse of :func:`_pack_idx_delta` → ``(idx [n,k] int32,
    ok [n] bool, fits [n] bool)``."""
    base = rows[:, 0]
    pairs = np.ascontiguousarray(rows[:, 1:-1]).view(np.uint32)
    k2 = pairs.shape[1]
    delta = np.empty((rows.shape[0], 2 * k2), dtype=np.int32)
    delta[:, 0::2] = (pairs & 0xFFFF).astype(np.int32)
    delta[:, 1::2] = (pairs >> 16).astype(np.int32)
    flags = rows[:, -1]
    return (base[:, None] + delta[:, :k],
            (flags & 1) != 0, (flags & 2) != 0)


def _sort_neighbors(sq, idx, *payload):
    """Canonical neighbor order: ascending ``(sq, idx)`` lexicographic.

    Both k-NN paths (grid and full scan) select the same exact neighbor
    *set*, but in different orders; f32 reductions over the k neighbors
    (IDW sums) are order-sensitive at the ulp level, which would make
    results depend on which path answered a query.  A deterministic sort
    makes grid and full-scan outputs bitwise identical."""
    out = jax.lax.sort((sq, idx) + payload, dimension=1, num_keys=2)
    return out


def _idw(sq, eps: float = 1e-12):
    """Normalized inverse-distance weights from squared distances.

    Matches the reference export path (``export.py:428-429``):
    ``w = 1 / clamp(dist, 1e-12)`` normalized per row, which also reproduces
    sklearn's exact-match special case (a zero-distance neighbor's clamped
    weight dominates the row)."""
    dists = jnp.sqrt(jnp.maximum(sq, 0.0))
    w = 1.0 / jnp.clip(dists, min=eps)
    return w / w.sum(axis=1, keepdims=True)


def _neighbor_offsets(d: int, radius: int = 1) -> np.ndarray:
    """All (2r+1)^d offsets in {-r..r}^d (the query cell's neighborhood)."""
    rng = np.arange(-radius, radius + 1)
    return np.stack(np.meshgrid(*([rng] * d), indexing="ij"),
                    axis=-1).reshape(-1, d).astype(np.int32)


def _grid_flat_cells(anchors, n_cells_total, origin, inv_h, dims):
    """Flat ids of each anchor's 3^d grid neighborhood (out-of-range → the
    empty sentinel cell ``n_cells_total - 1``). Returns ``flat [Q, 3^d]``."""
    flat, _ = _grid_neighborhood(anchors, n_cells_total, origin, inv_h, dims)
    return flat


def _overflow_contaminated(queries, ovf_nb, sq_max, origin, inv_h, dims,
                           radius: int = 1):
    """Precise overflow verdict: a query is contaminated only if an
    OVERFLOWING neighborhood cell's box intersects its k-ball (hidden
    members beyond the cell capacity can only live inside that box).  The
    naive ``any(overflow)`` flag forced exact fallbacks for every query
    near one of a handful of overflowing cells — in clustered refinement
    regions that meant a full scan every iteration for nothing.

    ``ovf_nb [Q, R]`` per-neighbor overflow flags in `_neighbor_offsets`
    order (bool, or f32 0/1 — the flag tables are stored f32 on device
    because bool sub-word row gathers measured ~2x slower); ``sq_max [Q]``
    the realized k-th squared distance.  The query's home cell is CLAMPED
    to the grid (out-of-bbox queries gather the nearest boundary cell's
    neighborhood — the boxes tested here must be the flags' boxes)."""
    d = queries.shape[1]
    offs = jnp.asarray(_neighbor_offsets(d, radius), dtype=jnp.float32)
    h = 1.0 / inv_h
    cc = jnp.clip(jnp.floor((queries - origin) * inv_h), 0.0,
                  jnp.asarray(dims, jnp.float32) - 1.0)
    lo_box = (cc[:, None, :] + offs[None, :, :]) * h + origin
    gap = jnp.maximum(jnp.maximum(lo_box - queries[:, None, :],
                                  queries[:, None, :] - (lo_box + h)), 0.0)
    dist2 = jnp.sum(gap * gap, axis=-1)                                 # [Q, R]
    return ((ovf_nb > 0.5) & (dist2 <= sq_max[:, None])).any(axis=1)


def _covered_margin_sq(t, cc, dims, inv_h, radius: int):
    """Squared *exactness margin* of the covered neighborhood box, aware of
    the grid boundary: every point within ``sqrt(margin_sq)`` of the anchor
    provably lies inside the covered extent of the (2r+1)^d neighborhood of
    (clamped) cell ``cc``, so a top-k whose worst distance stays below the
    margin is exact.

    Per axis the covered cell interval is ``[max(cc−r, 0), min(cc+r+1,
    dims))``; a face that lies ON the grid boundary imposes NO constraint —
    the grid spans the point cloud's bbox, so no point exists beyond it.
    This is what makes near-wall and (clamped) outside-the-bbox queries
    answerable by the grid at all: octree cell centers of domain-wall
    straddler cells sit up to half a cell OUTSIDE the cloud bbox, and with
    the old inside-only margin every one of them fell back to an exact
    scan — 92 % of the 2M-point workload's 11.9k-bad-cell retry storm.

    For an anchor OUTSIDE the bbox the plain face-distance test is far too
    strict: its k-ball reaches the points only through a shallow cap at
    the wall, and along any axis ``a`` a point ``p`` inside the bbox obeys
    ``|p_a − q_a| ≤ sqrt(r² − Σ_{b≠a} out_b²)`` (``out_b`` = the anchor's
    outside distance along axis ``b``).  The per-axis acceptance is
    therefore ``r² ≤ face_dist_a² + Σ_{b≠a} out_b²`` — for a domain-wall
    straddler cell center 6h outside, the in-plane faces at ~1h admit a
    36h²-larger ball than the naive test, which is exactly why those
    queries are answerable by the 3^d neighborhood at all (they were the
    bulk of the 2M-point workload's retry storm: coarse straddlers sit
    many h outside, beyond ANY fixed rescue-ring radius).

    The result is capped at 9e28, just below the 1e30-scale squared
    distances of the 1e15 pad slots: a fully boundary-covered neighborhood
    (margin = +inf) must still reject rows whose top-k ran out of real
    candidates."""
    h = 1.0 / inv_h
    # outside distance per axis, squared (0 inside the bbox)
    out = jnp.maximum(jnp.maximum(t - dims, -t), 0.0) * h               # [Q, d]
    out_sq = out * out
    oth = out_sq.sum(axis=1, keepdims=True) - out_sq                    # [Q, d]
    dlo = t - jnp.maximum(cc - radius, 0)                               # [Q, d]
    dhi = jnp.minimum(cc + radius + 1, dims) - t
    dlo = jnp.where(cc - radius <= 0, jnp.inf, dlo)
    dhi = jnp.where(cc + radius + 1 >= dims, jnp.inf, dhi)
    face = jnp.minimum(dlo, dhi) * h                                    # [Q, d]
    margin_sq = ((face * face + oth) * (1.0 - 1e-4)).min(axis=1)        # [Q]
    return jnp.minimum(margin_sq, 9e28)


def _grid_neighborhood(anchors, n_cells_total, origin, inv_h, dims,
                       radius: int = 1):
    """Flat ids of each anchor's (2r+1)^d grid neighborhood plus the squared
    exactness margin (see :func:`_covered_margin_sq`).  Anchors outside the
    grid bbox are clamped to their nearest boundary cell — the margin then
    accounts for the anchor-to-box distance exactly.
    Returns ``(flat [Q, (2r+1)^d], margin_sq [Q])``."""
    d = anchors.shape[1]
    offs = jnp.asarray(_neighbor_offsets(d, radius))
    t = (anchors - origin) * inv_h
    cc = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, dims - 1)          # [Q, d]
    margin_sq = _covered_margin_sq(t, cc, dims, inv_h, radius)
    nb = cc[:, None, :] + offs[None, :, :]                              # [Q, R, d]
    valid = jnp.logical_and(nb >= 0, nb < dims[None, None, :]).all(-1)  # [Q, R]
    flat = nb[..., 0]
    for ax in range(1, d):
        flat = flat * dims[ax] + nb[..., ax]
    return jnp.where(valid, flat, n_cells_total - 1), margin_sq


def _grid_candidates(queries, cell_pts, cell_list, cell_overflow, origin,
                     inv_h, dims):
    """Gather the 3^d-neighborhood candidates of each query from the bucket
    grid and compute exact squared distances.

    The member *coordinates* are read from the blocked layout ``cell_pts
    [n_cells+1, C, d]`` — one contiguous C·d·4-byte slab per grid cell — so
    the gather moves cache-line-sized blocks instead of 12-byte random
    lookups (the pointwise form was ~90 % of the kernel's wall time on TPU).

    Returns ``(d2 [Q, 3^d·C], cand [Q, 3^d·C], margin_sq [Q], ovf_nb
    [Q, 3^d] per-neighbor overflow flags, flat [Q, 3^d])``.
    """
    flat, margin_sq = _grid_neighborhood(queries, cell_list.shape[0],
                                         origin, inv_h, dims)
    q = queries.shape[0]
    cand = cell_list[flat].reshape(q, -1)                               # [Q, 3^d·C]
    ovf_nb = cell_overflow[flat]                                        # [Q, 3^d]
    cpts = cell_pts[flat]                                               # [Q, 3^d, C, d]
    delta = queries[:, None, None, :] - cpts
    d2 = jnp.sum(delta * delta, axis=-1).reshape(q, -1)                 # [Q, 3^d·C]
    return d2, cand, margin_sq, ovf_nb, flat


def _topk_canonical(d2, cand, k):
    """Top-k with a +8 slack so f32 distance TIES at the k-boundary resolve
    by ascending global point index — the order the full-scan path emits —
    instead of by candidate-slot position.  Returns ``(sq, idx, sel)``
    ``[Q, k]`` in canonical ascending ``(sq, idx)`` order."""
    kk = min(k + 8, d2.shape[1])
    # fusion fence: at small row counts (≤ ~4-8k, the device-loop regime)
    # XLA fuses the candidate gather + distance reduce INTO top_k's
    # multi-pass selection, recomputing them per pass — measured 45 ms for
    # a [4096, 864] pass whose pieces cost 13 ms; the barrier restores
    # 10 ms and is neutral at 36k rows (where XLA already materializes d2)
    d2 = jax.lax.optimization_barrier(d2)
    top_s, sel = jax.lax.top_k(-d2, kk)
    idx = jnp.take_along_axis(cand, sel, axis=1)
    sq, idx, sel = jax.lax.sort((-top_s, idx, sel), dimension=1, num_keys=2)
    return sq[:, :k], idx[:, :k], sel[:, :k]


@partial(jax.jit, static_argnames=("k",))
def _grid_query_kernel(queries, cell_pts, cell_list, cell_overflow, origin,
                       inv_h, dims, k):
    d2, cand, margin_sq, ovf_nb, _ = _grid_candidates(
        queries, cell_pts, cell_list, cell_overflow, origin, inv_h, dims)
    sq, idx, _ = _topk_canonical(d2, cand, k)
    ok = ((sq.max(axis=1) <= margin_sq)
          & ~_overflow_contaminated(queries, ovf_nb, sq.max(axis=1),
                                    origin, inv_h, dims))
    return sq, idx, ok


@partial(jax.jit, static_argnames=("k",))
def _grid_predict_kernel(queries, cell_pts, cell_vals, cell_list,
                         cell_overflow, origin, inv_h, dims, k):
    d2, cand, margin_sq, ovf_nb, flat = _grid_candidates(
        queries, cell_pts, cell_list, cell_overflow, origin, inv_h, dims)
    sq, idx, sel = _topk_canonical(d2, cand, k)
    ok = ((sq.max(axis=1) <= margin_sq)
          & ~_overflow_contaminated(queries, ovf_nb, sq.max(axis=1),
                                    origin, inv_h, dims))
    w = _idw(sq)
    # values gathered from the same blocked layout, then selected
    q = queries.shape[0]
    vals_blk = cell_vals[flat]
    if cell_vals.ndim == 2:
        vals = jnp.take_along_axis(vals_blk.reshape(q, -1), sel, axis=1)
        pred = jnp.einsum("qk,qk->q", w, vals)
    else:
        vals = jnp.take_along_axis(
            vals_blk.reshape(q, -1, cell_vals.shape[-1]), sel[..., None], axis=1)
        pred = jnp.einsum("qk,qkc->qc", w, vals)
    return pred, ok


@partial(jax.jit, static_argnames=("k", "tile_n", "tile_q"))
def _query_padded(queries, points, points_sq, k, tile_n, tile_q):
    sq, idx = _search(queries, points, points_sq, k, tile_n, tile_q)
    return jnp.sqrt(jnp.maximum(sq, 0.0)), idx


@partial(jax.jit, static_argnames=("k", "tile_n", "tile_q"))
def _predict_padded(queries, points, points_sq, values, k, tile_n, tile_q):
    """Fused search + inverse-distance regression: ONE device round trip."""
    sq, idx = _search(queries, points, points_sq, k, tile_n, tile_q)
    w = _idw(sq)
    vals = values[idx]  # [Q, k] or [Q, k, C]
    if vals.ndim == 3:
        return jnp.einsum("qk,qkc->qc", w, vals)
    return jnp.einsum("qk,qk->q", w, vals)


@jax.jit
def _blocked_pts_device(points_padded, cell_list):
    """Build the blocked member-coordinate layout ``[rows, C, d]`` on device
    by gathering the already-uploaded (Morton-sorted, padded) point array —
    saves re-uploading ~C·d·4 bytes/cell through the link.  Pad rows of
    ``points_padded`` hold 1e30; clamp to the 1e15 pad convention so squared
    pad distances stay FINITE (an inf delta² would NaN-contaminate the
    dilated kernel's group-sum matmul through its zero entries)."""
    return jnp.minimum(points_padded[cell_list], 1e15)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _cell_list_device(cells, pos, order, n_rows, C, pad_idx):
    """Blocked member-index layout ``[n_rows, C]`` built on device from the
    plan's fill triplet — the triplet is ~2.4x smaller on the link than the
    host-assembled table. Pad triplet entries carry out-of-bounds ``cells``;
    XLA drops out-of-bounds scatter updates, so they are no-ops."""
    out = jnp.full((n_rows, C), pad_idx, dtype=jnp.int32)
    return out.at[cells, pos].set(order)


@partial(jax.jit, static_argnums=(4, 5))
def _cell_vals_device(cells, pos, order, values_sorted, n_rows, C):
    """Blocked member-value layout matching ``_cell_list_device``, gathered
    from the already-uploaded sorted value array (zero extra link traffic).
    Pad slots stay 0; their distances are +inf so they never rank."""
    out = jnp.zeros((n_rows, C) + values_sorted.shape[1:], dtype=jnp.float32)
    return out.at[cells, pos].set(values_sorted[order])


# rows per block of the chunked dilated-layout builders: bounds the
# full-width [block, 3^d·C·(d+1)] sort transients to ~350 MB regardless of
# cell count (the unchunked build materialized ~5.5 GB of transients at a
# 2M-point / 200k-cell grid, which is why the dilated layout used to be
# size-gated off exactly where the at-scale workloads need it most)
_DILATE_BLOCK = 8192


@partial(jax.jit, static_argnums=(3, 4))
def _dilate_sorted_chunked(cell_pts_flat, cell_list, nb, d, keep):
    """Build the dilated grid layout, sorted and compacted, in row blocks.

    Each cell's 3^d neighborhood rows are concatenated (``[n, 3^d·C]``
    wide), sorted ascending by global (sorted-position) point index — pad
    slots (index = n_points) land last — and compacted to the max ACTUALLY
    OCCUPIED width ``keep`` (see :func:`_max_dilated_occupancy`; the slice
    is bit-exact because pads sort last).  Sorted rows let the query
    kernels resolve f32 distance ties at the k-boundary by ascending index
    (the canonical order every kNN path emits) with ONE plain stable
    ``top_k(k)`` — no slack widening, no [Q, k] 2-key re-sort (~10 ms per
    epoch call saved) — and the ``keep`` compaction measured a free ~2.2x
    on the dominant epoch terms (355 of 864 slots occupied on the c3d
    layout).

    The permutation is applied by carrying the coordinate lanes through
    ONE stable variadic ``lax.sort`` (argsort + pointwise row gathers
    measured 25x slower on the same layout).  Processing ``_DILATE_BLOCK``
    rows at a time inside a ``fori_loop`` keeps the full-width transients
    bounded; the final block overlaps the previous one when the row count
    is not a multiple (overlapped rows recompute identical values, so the
    duplicate writes are benign and the result is bit-identical to an
    unchunked build)."""
    n_rows = cell_list.shape[0]
    block = min(n_rows, _DILATE_BLOCK)
    n_blocks = -(-n_rows // block)
    out_pts = jnp.zeros((n_rows, keep * d), jnp.float32)
    out_cand = jnp.zeros((n_rows, keep), jnp.int32)

    def body(i, outs):
        op, oc = outs
        start = jnp.minimum(i * block, n_rows - block)
        rows = jax.lax.dynamic_slice_in_dim(nb, start, block)    # [B, 3^d]
        pts_u = cell_pts_flat[rows].reshape(block, -1, d)        # [B, W, d]
        cand_u = cell_list[rows].reshape(block, -1)              # [B, W]
        srt = jax.lax.sort(
            (cand_u,) + tuple(pts_u[:, :, j] for j in range(d)),
            dimension=1, num_keys=1, is_stable=True)
        pts_k = jnp.stack(srt[1:], axis=-1)[:, :keep, :]
        op = jax.lax.dynamic_update_slice_in_dim(
            op, pts_k.reshape(block, keep * d), start, 0)
        oc = jax.lax.dynamic_update_slice_in_dim(
            oc, srt[0][:, :keep], start, 0)
        return op, oc

    return jax.lax.fori_loop(0, n_blocks, body, (out_pts, out_cand))


@partial(jax.jit, static_argnums=(3,))
def _dil_vals_chunked(cell_vals, cell_list, nb, keep):
    """Dilated scalar-value rows aligned with the SORTED ``dil_cand`` layout
    (same blocking as :func:`_dilate_sorted_chunked`).

    Re-runs the same stable sort keys (ascending candidate index, same
    ``keep`` compaction), so slot ``j`` of row ``i`` holds the value of
    ``dil_cand[i, j]`` exactly — the fused epoch then gathers its selected
    neighbor values with ONE pointwise ``[Q, k]`` lookup from these rows
    instead of the serial pair (candidate-id lookup, then value lookup at
    its result), each ~5 ms per 36.8k queries on the v5e."""
    n_rows = cell_list.shape[0]
    block = min(n_rows, _DILATE_BLOCK)
    n_blocks = -(-n_rows // block)
    out_vals = jnp.zeros((n_rows, keep), jnp.float32)

    def body(i, ov):
        start = jnp.minimum(i * block, n_rows - block)
        rows = jax.lax.dynamic_slice_in_dim(nb, start, block)
        vals_u = cell_vals[rows].reshape(block, -1)
        cand_u = cell_list[rows].reshape(block, -1)
        srt = jax.lax.sort((cand_u, vals_u), dimension=1, num_keys=1,
                           is_stable=True)
        return jax.lax.dynamic_update_slice_in_dim(
            ov, srt[1][:, :keep], start, 0)

    return jax.lax.fori_loop(0, n_blocks, body, out_vals)


@jax.jit
def _fill_from_flat(flat_pad):
    """Derive the grid fill triplet ``(cells, pos, order)`` on device from
    per-point flat cell ids (in Morton-sorted point order).

    The host plan already computed these (cheap numpy), but uploading only
    the 4-byte/point flat ids and re-deriving the triplet here cuts the
    build's link traffic by ~2/3 (the triplet is 12 bytes/point; at 2M
    points that is 16 MB saved through a tunnel that can run at 2 MB/s).
    Membership is bit-exact with the host plan because the flat ids
    themselves are host-computed — only the (stable) grouping runs here.

    Pad entries carry the sentinel ``n_rows`` so they sort last; their
    scatter targets are out of bounds and therefore dropped."""
    n = flat_pad.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    flat_s, order = jax.lax.sort((flat_pad, iota), dimension=0, num_keys=1,
                                 is_stable=True)
    is_start = jnp.concatenate([jnp.ones((1,), bool),
                                flat_s[1:] != flat_s[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    pos = iota - seg_start
    return flat_s, pos, order


def _max_dilated_occupancy(plan: dict) -> int:
    """Exact max number of REAL (non-pad) candidates in any 3^d dilated row,
    from the plan's capped per-cell member counts — pure numpy on arrays the
    plan already has, zero device work.  Out-of-range neighbors contribute
    zero members, matching the sentinel row the dilated gather reads."""
    dims = tuple(int(x) for x in plan["dims"])
    counts = np.bincount(plan["fill"][0],
                         minlength=plan["n_cells"] + 1)[:plan["n_cells"]]
    cg = counts.reshape(dims)
    d = len(dims)
    cgp = np.pad(cg, [(1, 1)] * d)
    acc = np.zeros_like(cg)
    for off in np.ndindex(*(3,) * d):
        acc += cgp[tuple(slice(o, o + s) for o, s in zip(off, dims))]
    return int(acc.max()) if acc.size else 0


@jax.jit
def _dilate_flags(flags, nb):
    """Per-neighbor flags ``[n, 3^d]`` (NOT reduced — the precise overflow
    verdict needs to know WHICH neighborhood cell overflowed)."""
    return flags[nb]


def _grid_query_margin(queries, origin, inv_h, dims):
    """Flat (clamped) cell id + boundary-aware exactness margin of each
    query for the DILATED layout (the query's own cell indexes the
    pre-concatenated neighborhood; see :func:`_covered_margin_sq`).
    Queries outside the grid bbox map to their nearest boundary cell —
    every query therefore gathers a real dilated row, and the margin
    decides exactness."""
    d = queries.shape[1]
    t = (queries - origin) * inv_h
    cc = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, dims[None, :] - 1)
    margin_sq = _covered_margin_sq(t, cc, dims[None, :], inv_h, radius=1)
    flat = cc[..., 0]
    for ax in range(1, d):
        flat = flat * dims[ax] + cc[..., ax]
    return flat, margin_sq


def _dilated_select(queries, dil_pts, dil_cand, flat, k,
                    sorted_rows: bool = False):
    """Candidate scoring + canonical top-k on the dilated rows ``flat``
    (the core of :func:`_dilated_topk`, reusable with externally computed —
    e.g. shard-local — row ids).  Returns ``(sq [Q, k], idx [Q, k],
    sel [Q, k])`` in canonical ascending ``(sq, idx)`` order, with ``sel``
    the position in the flattened candidate axis (for value gathers).
    Both selection routes resolve equal distances canonically on their own
    (first-minimum == lowest candidate index on sorted rows; the 2-key
    sort orders by index explicitly), so no per-row tie flag is needed —
    rows whose exactness cannot be guaranteed are caught by the caller's
    margin/overflow test instead.

    Distances are ranked by the PLAIN f32 delta-sum from the start — the
    same elementwise formula every other kNN path emits, so the values are
    canonical without any re-rank.  (An earlier version scored through an
    MXU group-sum matmul and re-ranked k+8 candidates by the plain sum to
    repair its ulp-level rounding differences; measured on the v5e, the
    plain [Q, 3^d·C, d] reduce costs ~3 ms more than the matmul per 36.8k
    queries but eliminates the ~17 ms re-rank tail — the pointwise
    selected-point gather plus wide 2-key sort — for a net ~16 ms/call
    win.)

    With ``sorted_rows=True`` (single-chip layout, rows pre-sorted by
    candidate index in :func:`_sort_dilated`) first-minimum selection —
    equal values resolve to the lowest slot — makes slot order EQUAL
    ascending-candidate-index order, so the canonical k-boundary tie
    resolution falls out directly: no +8 slack, no 2-key re-sort, and the
    candidate ids are gathered POINTWISE for the k selected slots only
    ([Q, k] int32) instead of the whole [Q, 3^d·C] row (~5 ms/36.8k
    queries each, measured).  On TPU the selection runs through the Pallas
    iterative min-extraction kernel (:mod:`.pallas_topk`, bit-exact values,
    ~6.6 ms vs ``lax.top_k``'s 12.8 ms at the [36.8k, 864] epoch shape);
    elsewhere ``lax.top_k``'s documented stability implements the identical
    semantics.  Unsorted (sharded, host-sliced) layouts keep the slack +
    2-key sort route.

    ``lax.approx_max_k(recall_target=1.0)`` was measured here at 7.0 ms vs
    ``top_k``'s 12.8 ms on the [36.8k, 864] epoch shape and returns the
    correct SET — but it perturbs the returned VALUES by up to 3 ulp (its
    internal value/iota packing), so order between near-equal distances
    cannot be trusted and recomputing exact values needs a pointwise
    [Q, k] gather that costs the difference back."""
    q = queries.shape[0]
    d = queries.shape[1]
    g3 = dil_pts[flat].reshape(q, -1, d)                 # [Q, 3^d·C, d]
    dd = queries[:, None, :] - g3
    sq = jnp.sum(dd * dd, axis=-1)                       # [Q, 3^d·C] plain f32
    # fusion fence before top_k (see _topk_canonical): prevents XLA from
    # re-running the dilated gather + reduce once per top_k pass at small
    # query counts — the fused form measured 4.4x slower at 4096 queries
    sq = jax.lax.optimization_barrier(sq)
    if sorted_rows:
        if jax.default_backend() == "tpu" and q % 8 == 0:
            from .pallas_topk import topk_smallest
            sq_k, sel = topk_smallest(sq, k)
        else:
            top_s, sel = jax.lax.top_k(-sq, k)
            sq_k = -top_s
        idx = dil_cand[flat[:, None], sel]               # [Q, k] pointwise
        return sq_k, idx, sel
    # canonical ascending (sq, idx) order over the widened set, keep k —
    # output is already in `_sort_neighbors` order
    return _topk_canonical(sq, dil_cand[flat], k)


def _dilated_topk(queries, dil_pts, dil_cand, dil_ovf, origin, inv_h, dims,
                  k, sorted_rows: bool = False):
    """Candidate search on the dilated layout: ONE gather slice per query,
    plain f32 squared distances, then top-k.

    Returns ``(sq [Q, k], idx [Q, k], sel [Q, k], ok [Q], flat [Q])`` in
    canonical ascending ``(sq, idx)`` order."""
    flat, margin_sq = _grid_query_margin(queries, origin, inv_h, dims)
    sq, idx, sel = _dilated_select(queries, dil_pts, dil_cand, flat, k,
                                   sorted_rows=sorted_rows)
    ok = ((sq.max(axis=1) <= margin_sq)
          & ~_overflow_contaminated(queries, dil_ovf[flat], sq.max(axis=1),
                                    origin, inv_h, dims))
    return sq, idx, sel, ok, flat


@partial(jax.jit, static_argnames=("k",))
def _grid_query_kernel_dil(queries, dil_pts, dil_cand, dil_ovf, origin,
                           inv_h, dims, k):
    sq, idx, _, ok, _ = _dilated_topk(queries, dil_pts, dil_cand, dil_ovf,
                                      origin, inv_h, dims, k,
                                      sorted_rows=True)
    return sq, idx, ok


@partial(jax.jit, static_argnames=("k",))
def _grid_predict_kernel_dil(queries, dil_pts, dil_cand, dil_ovf, values,
                             origin, inv_h, dims, k):
    """IDW prediction on the dilated layout.  Neighbor values are gathered
    POINTWISE from the (Morton-sorted) value array at the k selected global
    indices — [Q, k] 4·n_ch-byte lookups (~4 MB) instead of the [Q, 3^d·C]
    neighborhood-value rows (~127 MB, ~5 ms per 36.8k queries), which also
    retires the 3^d-dilated value copy (``dil_vals``, ~170 MB HBM at the
    500k-point bench grid) and makes multi-channel values ride the same
    kernel.  Pad candidates (idx = n_points, clamped by XLA's OOB-gather
    rule) only appear in rows whose margin check already failed — those
    rows are re-answered exactly elsewhere."""
    sq, idx, sel, ok, flat = _dilated_topk(queries, dil_pts, dil_cand,
                                           dil_ovf, origin, inv_h, dims, k,
                                           sorted_rows=True)
    w = _idw(sq)
    vals = values[idx]                                    # [Q, k] or [Q, k, C]
    if vals.ndim == 3:
        pred = jnp.einsum("qk,qkc->qc", w, vals)
    else:
        pred = jnp.einsum("qk,qk->q", w, vals)
    return pred, ok


def _plan_grid(points: np.ndarray, n_points: int, pad_idx: int,
               occupancy: int, capacity: int,
               host_arrays: bool = True, shrink_target: int = 32) -> dict:
    """Host-side bucket-grid plan over a (centered) point cloud.

    Chooses the cell size ``h`` (≈ (occupancy/density)^(1/d), grown to a
    ~8·N storage cap, then shrunk until no cell exceeds ``shrink_target``
    members when the budget allows — overflow cells sit exactly where
    refinement clusters and force exact fallbacks every iteration), then
    builds the blocked member layout.  Returns numpy arrays only; callers
    device-put them with whatever sharding fits (single chip: replicated;
    multi-chip: cell rows sharded over the mesh).  Member indices reference
    ``points``' row order.
    """
    d = points.shape[1]
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    extent = np.maximum(hi - lo, 1e-30)
    density = n_points / float(np.prod(extent))
    h = (occupancy / density) ** (1.0 / d)

    def build_cells(h_val):
        dims_v = np.maximum(np.ceil(extent / h_val).astype(np.int64), 1)
        cc = np.clip(((points - lo) / h_val).astype(np.int64), 0,
                     dims_v - 1)
        flat_v = cc[:, 0]
        for ax in range(1, d):
            flat_v = flat_v * dims_v[ax] + cc[:, ax]
        counts_v = np.bincount(flat_v, minlength=int(np.prod(dims_v)))
        return dims_v, flat_v, counts_v

    # storage bound on the REALIZED capacity target (cells beyond it
    # overflow): the shrink loop trades more cells for a narrower candidate
    # width, both hot kernel stages scale with 3^d·C
    store_c = min(capacity, 2 * shrink_target)

    def storage_ok(h_val):
        dims_v = np.maximum(np.ceil(extent / h_val).astype(np.int64), 1)
        return np.prod(dims_v) * store_c <= 8 * n_points + 4096

    # cap the total cell count at ~4 points of storage per point
    while not storage_ok(h):
        h *= 1.26
    dims, flat, counts = build_cells(h)
    for _ in range(8):
        if counts.max() <= shrink_target or not storage_ok(h / 1.15):
            break
        h /= 1.15
        dims, flat, counts = build_cells(h)
    n_cells = int(np.prod(dims))

    order = np.argsort(flat, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos_in_cell = np.arange(n_points) - starts[flat[order]]

    # capacity: the pow2 covering the realized max occupancy when that
    # fits (zero overflow), else the 99.9th percentile with the rest
    # overflowing into the exact fallback. Both hot kernel stages scale
    # with the 3^d·C candidate width, so keep C tight.
    maxc = int(counts.max())
    if maxc <= capacity:
        C = max(16, 1 << int(max(maxc, 2) - 1).bit_length())
    else:
        occupied = counts[counts > 0]
        c999 = int(np.percentile(occupied, 99.9)) if occupied.size else 1
        C = 1 << int(max(c999, 2, occupancy) - 1).bit_length()
        C = int(min(capacity, max(16, C)))
    keep = pos_in_cell < C
    overflow = np.zeros(n_cells + 1, dtype=bool)
    overflow[:n_cells] = counts > C

    plan = {"h": float(h), "C": C, "n_cells": n_cells, "origin": lo,
            "dims": dims, "overflow": overflow,
            "fill": (flat[order][keep], pos_in_cell[keep], order[keep]),
            # per-point flat cell ids in input (Morton-sorted) order: the
            # single-chip build uploads ONLY these and re-derives the fill
            # triplet on device (_fill_from_flat) — 1/3 the link bytes
            "flat_ids": flat.astype(np.int32)}
    if host_arrays:
        # single-chip callers build these ON DEVICE from the fill triplet
        # (the triplet is ~2.4x smaller on the link than cell_list alone);
        # the sharded path still slices the host copies per device row-slab
        cell_list = np.full((n_cells + 1, C), pad_idx, dtype=np.int32)
        cell_list[flat[order][keep], pos_in_cell[keep]] = \
            order[keep].astype(np.int32)
        plan["cell_list"] = cell_list
        # blocked member coordinates [n_cells+1, C, d]: the query kernels
        # gather one contiguous C·d·4-byte slab per neighborhood cell instead
        # of C pointwise 12-byte lookups (the pointwise gather was ~90 % of
        # the kernel wall time on TPU); pad slots hold 1e15 so squared
        # distances stay finite (~3e30) yet never rank into any top-k
        cell_pts = np.full((n_cells + 1, C, d), 1e15, dtype=np.float32)
        cell_pts[flat[order][keep], pos_in_cell[keep]] = \
            points[order[keep]].astype(np.float32)
        plan["cell_pts"] = cell_pts
    return plan


def _grid_neighbor_table(dims: np.ndarray, n_cells: int) -> np.ndarray:
    """``[n_cells+1, 3^d]`` int32: each cell's 3^d neighborhood as flat cell
    ids (out-of-range and the sentinel row map to the sentinel ``n_cells``).

    Built one offset at a time over int32 [n_cells] columns — a single
    ``coords[:, None, :] + offsets`` broadcast materializes
    ``n_cells·3^d·d`` int64 temporaries (~160 MB at 250k cells), which this
    host's single memory-bound core pays ~2 s for."""
    d = len(dims)
    coords = np.stack(np.unravel_index(
        np.arange(n_cells, dtype=np.int64), dims), axis=1).astype(np.int32)
    dims32 = dims.astype(np.int32)
    offsets = _neighbor_offsets(d)
    out = np.empty((n_cells + 1, 3 ** d), dtype=np.int32)
    out[n_cells] = n_cells
    strides = np.ones(d, dtype=np.int32)
    for ax in range(d - 2, -1, -1):
        strides[ax] = strides[ax + 1] * dims32[ax + 1]
    base = coords @ strides  # flat id of each cell
    for j, off in enumerate(offsets):
        col = base + int((off * strides).sum())
        valid = np.ones(n_cells, dtype=bool)
        for ax in range(d):
            if off[ax]:
                c = coords[:, ax] + int(off[ax])
                valid &= (c >= 0) & (c < dims32[ax])
        out[:n_cells, j] = np.where(valid, col, n_cells)
    return out


def _neighbor_table_device(dims: tuple, n_cells: int, d: int):
    """Device-side twin of :func:`_grid_neighbor_table`: pure iota/elementwise
    integer math, so building it on device replaces a ~2 s host build plus a
    ``[n_cells+1, 3^d]`` int32 upload through the link with a sub-ms kernel."""
    offs = jnp.asarray(_neighbor_offsets(d), dtype=jnp.int32)  # [3^d, d]
    ids = jnp.arange(n_cells, dtype=jnp.int32)
    coords = []
    rem = ids
    for ax in range(d - 1, -1, -1):
        coords.append(rem % dims[ax])
        rem = rem // dims[ax]
    coords = jnp.stack(coords[::-1], axis=1)                    # [n_cells, d]
    nb = coords[:, None, :] + offs[None, :, :]                  # [n_cells, 3^d, d]
    dims_a = jnp.asarray(dims, dtype=jnp.int32)
    valid = jnp.logical_and(nb >= 0, nb < dims_a[None, None, :]).all(-1)
    flat = nb[..., 0]
    for ax in range(1, d):
        flat = flat * dims[ax] + nb[..., ax]
    flat = jnp.where(valid, flat, n_cells).astype(jnp.int32)
    return jnp.concatenate(
        [flat, jnp.full((1, 3 ** d), n_cells, jnp.int32)])


_neighbor_table_jit = jax.jit(_neighbor_table_device,
                              static_argnums=(0, 1, 2))


@jax.jit
def _scatter_rows(arr, rows, values):
    """Overwrite ``arr[rows]`` with ``values`` (duplicate rows are benign —
    they carry identical values)."""
    return arr.at[rows].set(values)


@jax.jit
def _finish_weights(sq, idx, perm_pad):
    """Normalized IDW weights + index map back to original point order."""
    dists = jnp.sqrt(jnp.maximum(sq, 0.0))
    w = 1.0 / jnp.clip(dists, min=1e-12)
    w = w / w.sum(axis=1, keepdims=True)
    return w, perm_pad[idx]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bucket_pow2(n: int, minimum: int) -> int:
    """Round up to a power-of-two multiple of ``minimum`` — bounds the number
    of distinct compiled shapes to O(log N) over a whole run."""
    n = max(n, minimum)
    return minimum * (1 << int(-(-n // minimum) - 1).bit_length())


class KNNIndex:
    """Device-resident point cloud supporting exact k-NN queries and
    inverse-distance-weighted regression (sklearn ``weights="distance"``
    semantics)."""

    # the bucket-grid fast path kicks in above this many points
    GRID_MIN_POINTS = 32768
    # target mean points per grid cell (sets the cell size h)
    GRID_OCCUPANCY = 16
    # upper bound on the per-cell member capacity; the realized capacity is
    # adaptive (pow2 covering the 99.9th-percentile occupancy) because BOTH
    # hot stages of the query kernels scale with the 3^d·C candidate width
    # (lax.top_k alone was ~50 ms per 32k queries at C=64). Cells beyond the
    # realized capacity overflow → their queries fall back to the exact
    # full scan, so a tight capacity costs only fallback frequency
    GRID_CAPACITY = 64
    # shrink the cell size until no cell holds more than this many members
    # (subject to the storage cap): both hot kernel stages scale with the
    # 3^d·C candidate width, and overflow-free sizing keeps the exact
    # fallback off the hot path
    GRID_SHRINK_TARGET = 32
    # queries per grid dispatch: bounds the blocked-gather temporary
    # [Q, 3^d, C, d] (~2.7x tiling expansion) to ~2 GB on a 16 GB v5e while
    # keeping the number of host→device round trips per query batch small;
    # doubled when the realized capacity is <= 32 (half the bytes per query)
    GRID_CHUNK = 32768

    @property
    def _grid_chunk(self) -> int:
        if self._grid is not None and self._grid.get("C", 64) <= 32:
            return 2 * self.GRID_CHUNK
        return self.GRID_CHUNK

    def __init__(self, points, values=None, dtype=jnp.float32,
                 tile_n: int = DEFAULT_TILE_N, tile_q: int = DEFAULT_TILE_Q):
        points = np.asarray(points)
        self.n_points, self.n_dim = points.shape
        self._tile_q = tile_q
        # shrink tiles for small clouds so padding stays bounded
        self._tile_n = min(tile_n, _round_up(self.n_points, 128))

        # center the cloud: improves f32 accuracy of the expanded score
        self._shift = points.mean(axis=0)
        centered = points - self._shift

        # Morton-sort the cloud: bucket-grid cells then hold contiguous index
        # ranges (gather locality) and the full-scan tiles stay spatially
        # coherent. ``_perm`` maps sorted position → original point index.
        self._perm = np.argsort(self._morton_codes(centered), kind="stable")
        sorted_pts = centered[self._perm]

        # +1 guarantees at least one pad row (the empty-cell sentinel target)
        n_pad = _round_up(self.n_points + 1, self._tile_n)
        # pad coordinates are huge so pad distances evaluate to +inf in the
        # grid path's direct distance computation (their ranking score in the
        # full scan is +inf via points_sq anyway)
        pts = np.full((n_pad, self.n_dim), 1e30, dtype=np.float32)
        pts[:self.n_points] = sorted_pts
        sq = np.full((n_pad,), np.inf, dtype=np.float32)
        sq[:self.n_points] = (sorted_pts.astype(np.float64) ** 2).sum(axis=1)

        self._points = jnp.asarray(pts, dtype=dtype)
        self._points_sq = jnp.asarray(sq, dtype=jnp.float32)
        self._points_host = centered  # for predict_host (tiny-query fast path)
        self._pad_idx = self.n_points  # first pad row (always exists)

        self._grid = None
        # exact-fallback row count of the most recent weights_device call
        # (observability: a silent full scan here is invisible in wall time
        # alone but dominates it)
        self.last_fallback = 0
        if (self.n_points >= self.GRID_MIN_POINTS and self.n_dim in (2, 3)):
            self._build_grid(sorted_pts)

        self._values = None
        if values is not None:
            self.set_values(values)

    def _build_grid(self, sorted_pts: np.ndarray) -> None:
        """Bucket grid over the sorted cloud (build plan §7.3): uniform cells
        of size ``h`` ≈ (occupancy/density)^(1/d); each cell stores up to
        ``GRID_CAPACITY`` member indices. A query's exact k-NN lies in its
        3^d neighborhood whenever d_k ≤ h — verified per query, with a
        full-scan fallback for the rest (overflowing cells, sparse regions,
        out-of-bbox queries)."""
        plan = _plan_grid(sorted_pts, self.n_points, self._pad_idx,
                          self.GRID_OCCUPANCY, self.GRID_CAPACITY,
                          host_arrays=False,
                          shrink_target=self.GRID_SHRINK_TARGET)
        C = plan["C"]
        n_rows = plan["n_cells"] + 1
        # upload only the per-point flat cell ids (padded to a pow2 bucket
        # with the out-of-bounds sentinel, which XLA's scatter drops) and
        # derive the fill triplet + blocked layouts on device — the ids are
        # 1/3 the link bytes of the fill triplet, and cell_list/cell_vals
        # then cost no upload at all.  Entries whose in-cell position
        # exceeds C scatter out of bounds column-wise and are dropped,
        # exactly like the host plan's ``keep`` filter.
        n_pad = _bucket_pow2(max(self.n_points, 1), 4096)
        fl = np.full((n_pad,), n_rows, dtype=np.int32)
        fl[:self.n_points] = plan["flat_ids"]
        fill_dev = _fill_from_flat(jnp.asarray(fl))
        cell_list_dev = _cell_list_device(
            *fill_dev, n_rows, C, self._pad_idx)
        self._grid = {
            "h": plan["h"],
            "C": C,
            "origin": jnp.asarray(plan["origin"], dtype=jnp.float32),
            "inv_h": jnp.float32(1.0 / plan["h"]),
            "dims": jnp.asarray(plan["dims"], dtype=jnp.int32),
            "cell_list": cell_list_dev,
            # f32 0/1, not bool: the [Q, R] flag row gathers in the query
            # kernels run ~2x faster on word-sized elements (6.5 -> 3.6 ms
            # per 36.8k queries measured on the c3d dilated layout)
            "overflow": jnp.asarray(plan["overflow"], dtype=jnp.float32),
            # gathered on device from the already-uploaded point array —
            # the C·d·4 B/cell host copy never crosses the link
            "cell_pts": _blocked_pts_device(self._points, cell_list_dev),
        }
        # device fill triplet for the lazy cell_vals build in set_values
        self._grid_fill = fill_dev

        # dilated fast path: each cell additionally stores its whole 3^d
        # neighborhood contiguously, so a query gathers ONE slice instead of
        # 3^d — measured ~4x better effective gather bandwidth on the v5e.
        # Memory is (3^d)x the blocked layout, so gate by size.
        d = self.n_dim
        C = plan["C"]
        n_cells = plan["n_cells"]
        # compacted row width: max occupied slots across all rows, bucketed
        # to a multiple of 64 (≥128) so compiled shapes stay O(few) per run
        # while the epoch kernels never touch the all-pad tail slots
        full_w = (3 ** d) * C
        occ = _max_dilated_occupancy(plan)
        keep_w = int(min(full_w, max(128, -(-occ // 64) * 64)))
        # d coord lanes + candidate ids + overflow flags + (set_values)
        # the scalar dilated value rows.  The gate is on PERSISTENT bytes
        # only — the chunked builders bound the build transients — and
        # defaults to 4 GB (the v5e has 16 GB HBM; a 2M-point/200k-cell
        # grid needs 1.8 GB, and losing the dilated layout also loses the
        # device-resident adaptive loop, which cost a measured ~45x in
        # per-cell throughput at that scale).  Beyond the gate the blocked
        # 3^d-gather path still works; override with S3_TPU_DIL_MAX_BYTES.
        dil_bytes = (n_cells + 1) * keep_w * (d + 3) * 4
        if dil_bytes <= float(os.environ.get("S3_TPU_DIL_MAX_BYTES", 4e9)):
            nb_dev = _neighbor_table_jit(
                tuple(int(x) for x in plan["dims"]), n_cells, d)
            self._grid["_nb"] = nb_dev
            self._grid["_dil_keep"] = keep_w
            g = self._grid
            # rows sorted ascending by candidate index: canonical k-boundary
            # tie-breaks then fall out of lax.top_k's stability (see
            # _dilate_sorted_chunked / _dilated_select)
            self._grid["dil_pts"], self._grid["dil_cand"] = \
                _dilate_sorted_chunked(
                    g["cell_pts"].reshape(n_cells + 1, C * d),
                    g["cell_list"], nb_dev, d, keep_w)
            self._grid["dil_ovf"] = _dilate_flags(g["overflow"], nb_dev)

    def _morton_codes(self, pts: np.ndarray) -> np.ndarray:
        from . import morton
        lo = pts.min(axis=0)
        extent = np.maximum(pts.max(axis=0) - lo, 1e-30)
        depth = morton.MAX_DEPTH.get(self.n_dim)
        if depth is None:  # 1D or >3D: fall back to lexicographic order
            return pts[:, 0]
        grid = np.clip(((pts - lo) / extent * ((1 << depth) - 1)).astype(np.uint64),
                       0, (1 << depth) - 1)
        return morton.encode(grid)

    def set_values(self, values) -> None:
        """Attach per-point values for :meth:`predict` (shape [N] or [N, C])."""
        values = np.asarray(values, dtype=np.float32)
        assert values.shape[0] == self.n_points
        sorted_vals = values[self._perm]
        self._values = jnp.asarray(sorted_vals)  # device copy in sorted order
        self._values_host = values
        if self._grid is not None:
            # blocked member values matching cell_pts (pad slots = 0; their
            # distances are +inf so they never rank into the top-k) —
            # assembled on device from the already-uploaded sorted values
            # and the device fill triplet: zero extra link traffic.  The
            # kernels gather selected values POINTWISE from ``_values``
            # nowadays; the blocked copy only serves the no-dilated-layout
            # predict fallback.
            cells, pos, order = self._grid_fill
            n_rows, C = self._grid["cell_list"].shape
            self._grid["cell_vals"] = _cell_vals_device(
                cells, pos, order, self._values, n_rows, C)
            self._grid.pop("dil_vals", None)
            if "dil_cand" in self._grid and values.ndim == 1:
                # scalar values on the dilated layout additionally get the
                # sorted dilated value rows (see _dil_vals_device); pad
                # cell_vals slots are 0 but only appear in rows whose
                # exactness margin already failed
                self._grid["dil_vals"] = _dil_vals_chunked(
                    self._grid["cell_vals"], self._grid["cell_list"],
                    self._grid["_nb"], self._grid["_dil_keep"])

    def _run_chunked(self, kernel_args_fn, queries):
        """Run a padded kernel over query chunks of ≤ MAX_QUERY_CHUNK rows.

        All chunks are dispatched first (JAX async dispatch overlaps upload,
        compute, and the previous chunk's readback); device→host conversion
        happens in a second pass."""
        queries = np.asarray(queries) - self._shift
        q = queries.shape[0]
        pending = []
        for lo in range(0, max(q, 1), MAX_QUERY_CHUNK):
            chunk = queries[lo:lo + MAX_QUERY_CHUNK]
            n = chunk.shape[0]
            n_pad = _bucket_pow2(n, self._tile_q)
            qarr = np.zeros((n_pad, self.n_dim), dtype=np.float32)
            qarr[:n] = chunk
            pending.append((kernel_args_fn(jnp.asarray(qarr)), n))
        # one packed transfer for ALL chunks and output arrays (see
        # _pack_i32); columns are decoded by the first chunk's dtypes
        first = pending[0][0]
        parts0 = first if isinstance(first, tuple) else (first,)
        widths = [1 if o.ndim == 1 else o.shape[1] for o in parts0]
        flat1d = [o.ndim == 1 for o in parts0]
        dts = [o.dtype for o in parts0]
        packed = [_pack_i32(*(out if isinstance(out, tuple) else (out,)))
                  for out, _ in pending]
        hosts = packed_readback(packed)
        chunks = []
        for (out, n), pk in zip(pending, hosts):
            rows = pk[:n]
            fields, off_c = [], 0
            for w_, dt, f1 in zip(widths, dts, flat1d):
                col = rows[:, off_c:off_c + w_]
                off_c += w_
                if dt == jnp.float32:
                    col = col.copy().view(np.float32)
                fields.append(col[:, 0] if f1 else col)
            chunks.append(tuple(fields))
        merged = tuple(np.concatenate(ps) for ps in zip(*chunks))
        return merged if isinstance(first, tuple) else merged[0]

    @property
    def _perm_pad(self):
        if not hasattr(self, "_perm_pad_cache"):
            pad = self._points.shape[0] - self.n_points
            self._perm_pad_cache = np.concatenate(
                [self._perm, np.zeros(pad, dtype=self._perm.dtype)])
        return self._perm_pad_cache

    # ------------------------------------------------------------------ #
    # bucket-grid search (exact, verified; full-scan fallback)            #
    # ------------------------------------------------------------------ #
    def _full_scan(self, queries_centered: np.ndarray, k: int, mode: str):
        """Plain chunked full scan on pre-centered queries."""
        if mode == "predict":
            return self._run_chunked(
                lambda qarr: _predict_padded(qarr, self._points, self._points_sq,
                                             self._values, k, self._tile_n,
                                             self._tile_q),
                queries_centered + self._shift)
        dists, idx = self._run_chunked(
            lambda qarr: _query_padded(qarr, self._points, self._points_sq, k,
                                       self._tile_n, self._tile_q),
            queries_centered + self._shift)
        return dists * dists, idx

    def _grid_run(self, queries: np.ndarray, k: int, mode: str):
        """Grid fast path with per-query exactness verification.

        A query's result is accepted only if its worst selected neighbor lies
        within the query's neighborhood margin (then the 3^d block provably
        contains the exact k-NN — ``_grid_neighborhood``) and none of its
        neighborhood cells overflowed; all other queries are re-run through
        the exact full scan.
        """
        g = self._grid
        q_total = queries.shape[0]
        qf32 = queries.astype(np.float32)
        pending = []
        grid_chunk = self._grid_chunk
        for lo in range(0, q_total, grid_chunk):
            chunk = qf32[lo:lo + grid_chunk]
            n = chunk.shape[0]
            n_pad = _bucket_pow2(n, min(self._tile_q, grid_chunk))
            qarr = np.zeros((n_pad, self.n_dim), dtype=np.float32)
            qarr[:n] = chunk
            use_dil = "dil_pts" in g and k <= g.get("_dil_keep", k)
            if mode == "predict":
                if use_dil:
                    # scalar and multi-channel values ride the same kernel
                    # (pointwise value gather at the selected indices)
                    fut = _grid_predict_kernel_dil(
                        jnp.asarray(qarr), g["dil_pts"], g["dil_cand"],
                        g["dil_ovf"], self._values, g["origin"],
                        g["inv_h"], g["dims"], k)
                else:
                    fut = _grid_predict_kernel(
                        jnp.asarray(qarr), g["cell_pts"], g["cell_vals"],
                        g["cell_list"], g["overflow"], g["origin"],
                        g["inv_h"], g["dims"], k)
            else:
                if use_dil:
                    fut = _grid_query_kernel_dil(
                        jnp.asarray(qarr), g["dil_pts"], g["dil_cand"],
                        g["dil_ovf"], g["origin"], g["inv_h"], g["dims"],
                        k)
                else:
                    fut = _grid_query_kernel(
                        jnp.asarray(qarr), g["cell_pts"], g["cell_list"],
                        g["overflow"], g["origin"], g["inv_h"], g["dims"], k)
            pending.append((lo, n, fut))

        if mode == "predict":
            out = np.empty((q_total,) + (() if self._values_host.ndim == 1
                                         else (self._values_host.shape[1],)),
                           dtype=np.float32)
        elif mode == "query_idx":
            out_idx = np.empty((q_total, k), dtype=np.int32)
        else:
            out_sq = np.empty((q_total, k), dtype=np.float32)
            out_idx = np.empty((q_total, k), dtype=np.int32)
        # pack every chunk's outputs into one int32 matrix on device and
        # read ALL chunks back in a single transfer; for "query_idx" the
        # sq buffer never crosses the link (distances are recomputed
        # host-side from the centered cloud) and the index block itself is
        # delta-compressed (``_pack_idx_delta``: ~44 % fewer bytes)
        if mode == "predict":
            packed = [_pack_i32(fut[0], fut[1]) for _, _, fut in pending]
        elif mode == "query_idx":
            packed = [_pack_idx_delta(fut[1], fut[2])
                      for _, _, fut in pending]
        else:
            packed = [_pack_i32(fut[0], fut[1], fut[2])
                      for _, _, fut in pending]
        hosts = packed_readback(packed)
        bad_rows = []
        misfits = []  # (chunk_pos, lo, local_rows) needing a raw-row fixup
        for pos, ((lo, n, fut), pk) in enumerate(zip(pending, hosts)):
            rows = pk[:n]
            if mode == "predict":
                out[lo:lo + n] = rows[:, :-1].copy().view(
                    np.float32).reshape(out[lo:lo + n].shape)
                ok = rows[:, -1] != 0
            elif mode == "query_idx":
                idx_c, ok, fits = _unpack_idx_delta(rows, k)
                out_idx[lo:lo + n] = idx_c
                mis = np.nonzero(ok & ~fits)[0]
                if mis.size:
                    misfits.append((pos, lo, mis))
            else:
                out_sq[lo:lo + n] = rows[:, :k].copy().view(np.float32)
                out_idx[lo:lo + n] = rows[:, k:2 * k]
                ok = rows[:, -1] != 0
            bad_rows.append(lo + np.nonzero(~ok)[0])

        if misfits:
            # rare rows whose index spread exceeded uint16: gather their raw
            # int32 rows on device (pow2-padded lists, one transfer for all)
            gathers = [
                _take_rows_pad(pending[pos][2][1],
                               jnp.asarray(mis.astype(np.int32)),
                               _bucket_pow2(mis.size, 8))
                for pos, _, mis in misfits]
            fixed = packed_readback(gathers)
            for (pos, lo, mis), fx in zip(misfits, fixed):
                out_idx[lo + mis] = fx[:mis.size]

        bad = np.concatenate(bad_rows) if bad_rows else np.zeros(0, dtype=int)
        self.last_fallback = int(bad.size)
        if bad.size:
            fb = self._full_scan(queries[bad], k,
                                 "query" if mode == "query_idx" else mode)
            if mode == "predict":
                out[bad] = fb
            elif mode == "query_idx":
                out_idx[bad] = fb[1]
            else:
                out_sq[bad], out_idx[bad] = fb

        if mode == "predict":
            return out
        if mode == "query_idx":
            return out_idx
        return out_sq, out_idx

    def _spatial_run(self, queries, k: int, mode: str):
        """Route through the bucket grid when available (its 3^d·C candidate
        set must also be able to hold k), else the plain full scan.

        Returns ``(sq, idx_sorted)`` for mode "query", ``pred`` for
        "predict" — idx in SORTED-point indexing (map via ``_perm_pad``).
        """
        queries = np.asarray(queries, dtype=np.float64) - self._shift
        if (self._grid is None or queries.shape[0] == 0
                or k > (3 ** self.n_dim) * self._grid["C"]):
            return self._full_scan(queries, k, mode)
        return self._grid_run(queries, k, mode)

    # ------------------------------------------------------------------ #
    # public API                                                          #
    # ------------------------------------------------------------------ #
    def query(self, queries, k: int):
        """Exact k-NN: returns ``(dists [Q, k], idx [Q, k])`` (numpy)."""
        assert k <= self.n_points, \
            f"k={k} exceeds the number of indexed points ({self.n_points})."
        sq, idx = self._spatial_run(queries, k, "query")
        return np.sqrt(np.maximum(sq, 0.0)), self._perm_pad[idx]

    def weights(self, queries, k: int):
        """Normalized inverse-distance weights: ``(w [Q, k], idx [Q, k])``.

        On the grid path only the ``[Q, k]`` int32 index block is read back
        from the device (the squared-distance buffer stays there) — through
        the tunnel this halves the dominant export transfer.  Distances are
        recomputed host-side in f32 from the centered cloud, the same
        arithmetic the device kernel uses, so the weights are unchanged at
        the ulp level that matters (both paths are exact k-NN over
        identical neighbor sets in canonical order)."""
        assert k <= self.n_points, \
            f"k={k} exceeds the number of indexed points ({self.n_points})."
        q64 = np.asarray(queries, dtype=np.float64) - self._shift
        use_grid = (self._grid is not None and q64.shape[0] > 0
                    and k <= (3 ** self.n_dim) * self._grid["C"])
        if use_grid:
            idx = self._perm_pad[self._grid_run(q64, k, "query_idx")]
            nbr = self._points_host32[idx]              # [Q, k, d] centered
            diff = nbr - q64[:, None, :].astype(np.float32)
            dists = np.sqrt(np.maximum((diff * diff).sum(-1), 0.0))
        else:
            sq, idx = self._full_scan(q64, k, "query")
            idx = self._perm_pad[idx]
            dists = np.sqrt(np.maximum(sq, 0.0))
        w = 1.0 / np.clip(dists, 1e-12, None)
        w /= w.sum(axis=1, keepdims=True)
        return w.astype(np.float32), idx

    @property
    def _points_host32(self) -> np.ndarray:
        """f32 centered cloud in ORIGINAL point order (host-side distance
        recomputation for :meth:`weights`)."""
        if not hasattr(self, "_points_host32_cache"):
            self._points_host32_cache = self._points_host.astype(np.float32)
        return self._points_host32_cache

    def weights_device(self, queries, k: int):
        """Device-resident variant of :meth:`weights` for pipelines that feed
        the weights straight into another device kernel (the export
        interpolation): only the per-query exactness bitmaps are read back
        (~1 bit/query) instead of the full ``[Q, k]`` weight/index arrays —
        through the tunnel (~35 MB/s readback) that is the difference
        between ~0.1 s and ~1 s per 150k queries.

        :return: ``(w [Q_pad, k] jnp.float32 row-normalized, idx [Q_pad, k]
            jnp.int32 in ORIGINAL point indexing, n)`` — rows ``n:`` are
            padding
        """
        assert k <= self.n_points
        queries = np.asarray(queries, dtype=np.float64) - self._shift
        n = queries.shape[0]
        use_grid = (self._grid is not None and n > 0
                    and k <= (3 ** self.n_dim) * self._grid["C"])
        if not use_grid:
            self.last_fallback = n  # every query ran the full scan
            sq, idx = self._full_scan(queries, k, "query")
            dists = np.sqrt(np.maximum(sq, 0.0))
            w = 1.0 / np.clip(dists, 1e-12, None)
            w /= w.sum(axis=1, keepdims=True)
            return (jnp.asarray(w.astype(np.float32)),
                    jnp.asarray(self._perm_pad[idx].astype(np.int32)), n)

        g = self._grid
        chunk = self._grid_chunk
        n_pad = (_bucket_pow2(n, 256) if n <= chunk
                 else -(-n // chunk) * chunk)
        qf32 = np.zeros((n_pad, self.n_dim), dtype=np.float32)
        qf32[:n] = queries
        parts = []
        for lo in range(0, n_pad, chunk):
            qarr = jnp.asarray(qf32[lo:lo + chunk])
            if "dil_pts" in g and k <= g.get("_dil_keep", k):
                parts.append(_grid_query_kernel_dil(
                    qarr, g["dil_pts"], g["dil_cand"], g["dil_ovf"],
                    g["origin"], g["inv_h"], g["dims"], k))
            else:
                parts.append(_grid_query_kernel(
                    qarr, g["cell_pts"], g["cell_list"], g["overflow"],
                    g["origin"], g["inv_h"], g["dims"], k))

        # tiny readback: only the ok bitmaps decide the exact-fallback rows
        # (all chunks' bitmaps staged into ONE transfer)
        ok_all = np.concatenate(packed_readback([p[2] for p in parts]))
        bad = np.nonzero(~ok_all[:n])[0]
        self.last_fallback = int(bad.size)  # exact-fallback row count

        sq_dev = (jnp.concatenate([p[0] for p in parts])
                  if len(parts) > 1 else parts[0][0])
        idx_dev = (jnp.concatenate([p[1] for p in parts])
                   if len(parts) > 1 else parts[0][1])
        if bad.size:
            sq_fix, idx_fix = self._full_scan(queries[bad], k, "query")
            # pow2-pad the scatter rows by repeating the first bad row —
            # writing the same row twice is idempotent, and bounds the
            # number of compiled scatter shapes
            p = _bucket_pow2(bad.size, 8)
            rows = np.full(p, bad[0], dtype=np.int32)
            rows[:bad.size] = bad
            sq_p = np.repeat(sq_fix[:1], p, axis=0)
            sq_p[:bad.size] = sq_fix
            idx_p = np.repeat(idx_fix[:1], p, axis=0)
            idx_p[:bad.size] = idx_fix
            sq_dev = _scatter_rows(sq_dev, jnp.asarray(rows),
                                   jnp.asarray(sq_p.astype(np.float32)))
            idx_dev = _scatter_rows(idx_dev, jnp.asarray(rows),
                                    jnp.asarray(idx_p.astype(np.int32)))

        if not hasattr(self, "_perm_pad_dev"):
            self._perm_pad_dev = jnp.asarray(self._perm_pad.astype(np.int32))
        w_dev, idx_orig = _finish_weights(sq_dev, idx_dev, self._perm_pad_dev)
        return w_dev, idx_orig, n

    def predict(self, queries, k: int):
        """Inverse-distance-weighted regression at the query points.

        Equivalent to sklearn ``KNeighborsRegressor(n_neighbors=k,
        weights="distance").predict`` on the attached values — fused into a
        single device call per ≤16k-query chunk.
        """
        assert self._values is not None, "No values attached; call set_values() first."
        assert k <= self.n_points, \
            f"k={k} exceeds the number of indexed points ({self.n_points})."
        return self._spatial_run(queries, k, "predict")

    def predict_host(self, queries, k: int) -> np.ndarray:
        """Host-side exact variant for tiny query counts (e.g. the root-cell
        gain, 1 + 2^d queries): a numpy brute-force pass is microseconds and
        avoids a device round trip entirely."""
        assert self._values is not None, "No values attached; call set_values() first."
        q = np.asarray(queries, dtype=np.float64) - self._shift
        p = self._points_host
        n = p.shape[0]
        # two stages: an f32 Gram-score pre-filter over ALL points (one
        # sgemm + one in-place add — a fully materialized f64 [Q, N]
        # distance matrix measured 1.4-1.7 s at N=500k on this memory-bound
        # host), then exact f64 distances on a 4k+16 candidate slack.  f32
        # relative error is ~1e-7, so a true k-th neighbor can only be
        # filtered out if >3k+16 points sit within f32 noise of the k-th
        # distance — far beyond the f64 tie ambiguity the exact path
        # already carries.  Points are pre-centered (self._shift), so the
        # Gram cancellation error is benign here.
        p32 = self._points_host32   # cached-f32 property
        pn232 = getattr(self, "_pnorm2_host32_cache", None)
        if pn232 is None:
            pn232 = self._pnorm2_host32_cache = np.einsum(
                "nd,nd->n", p32, p32)
        m = min(4 * k + 16, n)
        if m < n:
            s = (-2.0 * q.astype(np.float32)) @ p32.T        # [Q, N]
            s += pn232[None, :]
            cand = np.argpartition(s, m - 1, axis=1)[:, :m]
        else:
            cand = np.broadcast_to(np.arange(n), (q.shape[0], n))
        d2 = np.square(p[cand] - q[:, None, :]).sum(-1)      # exact f64
        sel = np.argpartition(d2, k - 1, axis=1)[:, :k]
        idx = np.take_along_axis(cand, sel, axis=1)
        dists = np.sqrt(np.take_along_axis(d2, sel, axis=1))
        w = 1.0 / np.clip(dists, 1e-12, None)
        w /= w.sum(axis=1, keepdims=True)
        vals = self._values_host[idx]  # [Q, k] or [Q, k, C]
        if vals.ndim == 3:
            return (w[..., None] * vals).sum(axis=1)
        return (w * vals).sum(axis=1)

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
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .._backend import enable_compilation_cache

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
    # candidate-buffer strategy: collect each tile's local top-k and merge
    # ONCE at the end (1 top_k per tile instead of 2) while the buffer
    # [tile_q, n_tiles·k] stays small; fall back to a running merge for
    # clouds with many tiles
    collect = n_tiles * k <= 8192

    def tile_topk(q, tile_idx):
        p_t = jax.lax.dynamic_slice_in_dim(points_t, tile_idx * tile_n, tile_n, axis=1)
        p_sq = jax.lax.dynamic_slice_in_dim(points_sq, tile_idx * tile_n, tile_n)
        # ranking score: |p|^2 - 2 q.p  (monotone in true distance per query)
        scores = p_sq[None, :] - 2.0 * jnp.dot(q, p_t, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        top_s, top_i = jax.lax.top_k(-scores, k)  # [tile_q, k]
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
            best_scores, sel = jax.lax.top_k(all_s, k)
            best_idx = jnp.take_along_axis(all_i, sel, axis=1)
        else:
            def scan_tile(carry, tile_idx):
                best_scores, best_idx = carry
                top_s, top_i = tile_topk(q, tile_idx)
                merged_s = jnp.concatenate([best_scores, top_s], axis=1)
                merged_i = jnp.concatenate([best_idx, top_i], axis=1)
                new_s, sel = jax.lax.top_k(merged_s, k)
                new_i = jnp.take_along_axis(merged_i, sel, axis=1)
                return (new_s, new_i), None

            init = (jnp.full((q.shape[0], k), -jnp.inf, dtype=jnp.float32),
                    jnp.zeros((q.shape[0], k), dtype=jnp.int32))
            (best_scores, best_idx), _ = jax.lax.scan(
                scan_tile, init, jnp.arange(n_tiles, dtype=jnp.int32))

        # exact distances for the selected neighbors (stable formulation)
        nb = points[best_idx]  # [tile_q, k, d]
        delta = q[:, None, :] - nb
        sq = jnp.sum(delta * delta, axis=-1)
        return sq, best_idx

    qq = queries.reshape(-1, tile_q, queries.shape[-1])
    sq, idx = jax.lax.map(per_q_chunk, qq)
    return sq.reshape(-1, k), idx.reshape(-1, k)


def _idw(sq, eps: float = 1e-12):
    """Normalized inverse-distance weights from squared distances.

    Matches the reference export path (``export.py:428-429``):
    ``w = 1 / clamp(dist, 1e-12)`` normalized per row, which also reproduces
    sklearn's exact-match special case (a zero-distance neighbor's clamped
    weight dominates the row)."""
    dists = jnp.sqrt(jnp.maximum(sq, 0.0))
    w = 1.0 / jnp.clip(dists, min=eps)
    return w / w.sum(axis=1, keepdims=True)


def _search_tiles(queries, points, points_sq, tile_ids, k: int,
                  tile_n: int, tile_q: int):
    """Like :func:`_search` but scans only the point tiles named in
    ``tile_ids`` (the spatial-pruning fast path). ``tile_ids`` may repeat the
    all-inf dummy tile as padding — its candidates rank last and are never
    selected while ≥ k real candidates exist."""
    points_t = points.T
    n_sel = tile_ids.shape[0]
    collect = n_sel * k <= 8192

    def tile_topk(q, tile_idx):
        p_t = jax.lax.dynamic_slice_in_dim(points_t, tile_idx * tile_n, tile_n, axis=1)
        p_sq = jax.lax.dynamic_slice_in_dim(points_sq, tile_idx * tile_n, tile_n)
        scores = p_sq[None, :] - 2.0 * jnp.dot(q, p_t, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        top_s, top_i = jax.lax.top_k(-scores, k)
        return top_s, top_i + tile_idx * tile_n

    def per_q_chunk(q):
        if collect:
            def scan_tile(_, tile_idx):
                return None, tile_topk(q, tile_idx)
            _, (all_s, all_i) = jax.lax.scan(scan_tile, None, tile_ids)
            all_s = jnp.moveaxis(all_s, 0, 1).reshape(q.shape[0], -1)
            all_i = jnp.moveaxis(all_i, 0, 1).reshape(q.shape[0], -1)
            best_scores, sel = jax.lax.top_k(all_s, k)
            best_idx = jnp.take_along_axis(all_i, sel, axis=1)
        else:
            def scan_tile(carry, tile_idx):
                best_scores, best_idx = carry
                top_s, top_i = tile_topk(q, tile_idx)
                merged_s = jnp.concatenate([best_scores, top_s], axis=1)
                merged_i = jnp.concatenate([best_idx, top_i], axis=1)
                new_s, sel = jax.lax.top_k(merged_s, k)
                return (new_s, jnp.take_along_axis(merged_i, sel, axis=1)), None
            init = (jnp.full((q.shape[0], k), -jnp.inf, dtype=jnp.float32),
                    jnp.zeros((q.shape[0], k), dtype=jnp.int32))
            (best_scores, best_idx), _ = jax.lax.scan(scan_tile, init, tile_ids)

        nb = points[best_idx]
        delta = q[:, None, :] - nb
        sq = jnp.sum(delta * delta, axis=-1)
        return sq, best_idx

    qq = queries.reshape(-1, tile_q, queries.shape[-1])
    sq, idx = jax.lax.map(per_q_chunk, qq)
    return sq.reshape(-1, k), idx.reshape(-1, k)


@partial(jax.jit, static_argnames=("k", "tile_n", "tile_q"))
def _query_padded(queries, points, points_sq, k, tile_n, tile_q):
    sq, idx = _search(queries, points, points_sq, k, tile_n, tile_q)
    return jnp.sqrt(jnp.maximum(sq, 0.0)), idx


@partial(jax.jit, static_argnames=("k", "tile_n", "tile_q"))
def _weights_padded(queries, points, points_sq, k, tile_n, tile_q):
    sq, idx = _search(queries, points, points_sq, k, tile_n, tile_q)
    return _idw(sq), idx


@partial(jax.jit, static_argnames=("k", "tile_n", "tile_q"))
def _predict_padded(queries, points, points_sq, values, k, tile_n, tile_q):
    """Fused search + inverse-distance regression: ONE device round trip."""
    sq, idx = _search(queries, points, points_sq, k, tile_n, tile_q)
    w = _idw(sq)
    vals = values[idx]  # [Q, k] or [Q, k, C]
    if vals.ndim == 3:
        return jnp.einsum("qk,qkc->qc", w, vals)
    return jnp.einsum("qk,qk->q", w, vals)


@partial(jax.jit, static_argnames=("k", "tile_n", "tile_q"))
def _query_tiles(queries, points, points_sq, tile_ids, k, tile_n, tile_q):
    sq, idx = _search_tiles(queries, points, points_sq, tile_ids, k, tile_n, tile_q)
    return sq, idx


@partial(jax.jit, static_argnames=("k", "tile_n", "tile_q"))
def _predict_tiles(queries, points, points_sq, values, tile_ids, k, tile_n, tile_q):
    """Tile-subset search + regression; also returns each query's worst
    selected squared distance for the host-side exactness check."""
    sq, idx = _search_tiles(queries, points, points_sq, tile_ids, k, tile_n, tile_q)
    w = _idw(sq)
    vals = values[idx]
    if vals.ndim == 3:
        pred = jnp.einsum("qk,qkc->qc", w, vals)
    else:
        pred = jnp.einsum("qk,qk->q", w, vals)
    return pred, sq.max(axis=1)


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

    # spatial pruning kicks in above this many real point tiles
    PRUNE_MIN_TILES = 8
    # initial search-radius safety factor over the uniform-density estimate
    PRUNE_RADIUS_FACTOR = 2.0
    # queries per pruned dispatch: smaller chunks have tighter Morton bboxes
    # and therefore fewer candidate tiles (the whole point of pruning)
    PRUNE_CHUNK = 2048

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

        # Morton-sort the cloud so point tiles are spatially coherent — the
        # basis of the tile-pruned search (§7.3 of the build plan: the
        # "spatial hash" is the Z-order tiling itself). ``_perm`` maps
        # sorted position → original point index for returned neighbor ids.
        self._perm = np.argsort(self._morton_codes(centered), kind="stable")
        sorted_pts = centered[self._perm]

        n_pad = _round_up(self.n_points, self._tile_n)
        self._n_real_tiles = n_pad // self._tile_n
        # one extra all-inf dummy tile used to pad pruned tile-id lists
        pts = np.zeros((n_pad + self._tile_n, self.n_dim), dtype=np.float32)
        pts[:self.n_points] = sorted_pts
        sq = np.full((n_pad + self._tile_n,), np.inf, dtype=np.float32)
        sq[:self.n_points] = (sorted_pts.astype(np.float64) ** 2).sum(axis=1)
        self._dummy_tile = self._n_real_tiles

        # per-tile bounding boxes over the real members (for pruning)
        lo = np.full((self._n_real_tiles, self.n_dim), np.inf)
        hi = np.full((self._n_real_tiles, self.n_dim), -np.inf)
        for t in range(self._n_real_tiles):
            members = sorted_pts[t * self._tile_n:(t + 1) * self._tile_n]
            if members.size:
                lo[t] = members.min(axis=0)
                hi[t] = members.max(axis=0)
        self._tile_lo, self._tile_hi = lo, hi

        # uniform-density estimate of the k-NN radius (pruning start value)
        extent = np.maximum(sorted_pts.max(axis=0) - sorted_pts.min(axis=0), 1e-30)
        self._density = self.n_points / float(np.prod(extent))

        self._points = jnp.asarray(pts, dtype=dtype)
        self._points_sq = jnp.asarray(sq, dtype=jnp.float32)
        self._points_host = centered  # for predict_host (tiny-query fast path)
        self._values = None
        if values is not None:
            self.set_values(values)

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
        self._values = jnp.asarray(values[self._perm])  # device copy in sorted order
        self._values_host = values

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
        outs = [tuple(np.asarray(o)[:n] for o in out)
                if isinstance(out, tuple) else np.asarray(out)[:n]
                for out, n in pending]
        if isinstance(outs[0], tuple):
            return tuple(np.concatenate(parts) for parts in zip(*outs))
        return np.concatenate(outs)

    @property
    def _perm_pad(self):
        if not hasattr(self, "_perm_pad_cache"):
            pad = self._points.shape[0] - self.n_points
            self._perm_pad_cache = np.concatenate(
                [self._perm, np.zeros(pad, dtype=self._perm.dtype)])
        return self._perm_pad_cache

    # ------------------------------------------------------------------ #
    # tile-pruned search (Morton tiling + verified radius)                #
    # ------------------------------------------------------------------ #
    def _candidate_tiles(self, chunk: np.ndarray, radius: float):
        """Real tiles whose bbox lies within ``radius`` of the chunk bbox;
        returns (tile_ids ascending, per-tile squared bbox distances)."""
        clo, chi = chunk.min(axis=0), chunk.max(axis=0)
        gap = np.maximum(0.0, np.maximum(self._tile_lo - chi, clo - self._tile_hi))
        dist2 = (gap ** 2).sum(axis=1)
        cand = np.nonzero(dist2 <= radius * radius)[0]
        if cand.size == 0:
            cand = np.asarray([int(np.argmin(dist2))])
        return cand, dist2

    def _dispatch_tiles(self, chunk: np.ndarray, cand: np.ndarray, k: int,
                        mode: str):
        n = chunk.shape[0]
        n_pad = _bucket_pow2(n, self._tile_q)
        qarr = np.zeros((n_pad, self.n_dim), dtype=np.float32)
        qarr[:n] = chunk
        t_pad = _bucket_pow2(cand.size, 4)
        tiles = np.full(t_pad, self._dummy_tile, dtype=np.int32)
        tiles[:cand.size] = cand
        if mode == "predict":
            return _predict_tiles(jnp.asarray(qarr), self._points, self._points_sq,
                                  self._values, jnp.asarray(tiles), k,
                                  self._tile_n, self._tile_q)
        return _query_tiles(jnp.asarray(qarr), self._points, self._points_sq,
                            jnp.asarray(tiles), k, self._tile_n, self._tile_q)

    def _pruned_run(self, queries: np.ndarray, k: int, mode: str):
        """Exact pruned search: dispatch every chunk against its candidate
        tiles, then VERIFY — a result is accepted only if every excluded
        tile's bbox is farther than the chunk's worst selected neighbor;
        failed chunks retry with a doubled radius (full scan in the limit).

        ``mode``: "query" → (sq, idx_sorted); "predict" → pred.
        """
        q_total = queries.shape[0]
        chunks = [(ci, queries[lo:lo + self.PRUNE_CHUNK])
                  for ci, lo in enumerate(range(0, q_total, self.PRUNE_CHUNK))]
        r0 = self.PRUNE_RADIUS_FACTOR * ((k + 1) / self._density) ** (1.0 / self.n_dim)
        results = [None] * len(chunks)
        todo = [(ci, chunk, r0) for ci, chunk in chunks]

        while todo:
            pending = []
            for ci, chunk, radius in todo:
                cand, dist2 = self._candidate_tiles(chunk, radius)
                fut = self._dispatch_tiles(chunk, cand, k, mode)
                pending.append((ci, chunk, radius, cand, dist2, fut))

            todo = []
            for ci, chunk, radius, cand, dist2, fut in pending:
                n = chunk.shape[0]
                if mode == "predict":
                    pred, sqmax = fut
                    max_sq = float(np.asarray(sqmax)[:n].max())
                    out = np.asarray(pred)[:n]
                else:
                    sq, idx = fut
                    sq = np.asarray(sq)[:n]
                    max_sq = float(sq.max())
                    out = (sq, np.asarray(idx)[:n])

                full = cand.size == self._n_real_tiles
                if not full:
                    excluded = np.ones(self._n_real_tiles, dtype=bool)
                    excluded[cand] = False
                    # conservative margin against f32 rounding of distances
                    if dist2[excluded].min() <= max_sq * (1.0 + 1e-4) + 1e-12:
                        todo.append((ci, chunk, radius * 2.0))
                        continue
                results[ci] = out

        if mode == "predict":
            return np.concatenate(results)
        sqs = np.concatenate([r[0] for r in results])
        idxs = np.concatenate([r[1] for r in results])
        return sqs, idxs

    def _spatial_run(self, queries, k: int, mode: str):
        """Route through the pruned path (Morton-sorted queries) when the
        cloud has enough tiles for pruning to pay, else the plain full scan.

        Returns ``(sq, idx_sorted)`` for mode "query", ``pred`` for
        "predict" — idx in SORTED-point indexing (map via ``_perm_pad``).
        """
        queries = np.asarray(queries, dtype=np.float64) - self._shift
        if self._n_real_tiles < self.PRUNE_MIN_TILES or queries.shape[0] == 0:
            if mode == "predict":
                return self._run_chunked(
                    lambda qarr: _predict_padded(qarr, self._points, self._points_sq,
                                                 self._values, k, self._tile_n,
                                                 self._tile_q),
                    queries + self._shift)
            sq, idx = self._run_chunked(
                lambda qarr: _query_padded(qarr, self._points, self._points_sq, k,
                                           self._tile_n, self._tile_q),
                queries + self._shift)
            return sq * sq, idx  # _query_padded returns distances; square back

        qorder = np.argsort(self._morton_codes(queries), kind="stable")
        out = self._pruned_run(queries[qorder].astype(np.float32), k, mode)
        unsort = np.empty_like(qorder)
        unsort[qorder] = np.arange(qorder.size)
        if mode == "predict":
            return out[unsort]
        sq, idx = out
        return sq[unsort], idx[unsort]

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
        """Normalized inverse-distance weights: ``(w [Q, k], idx [Q, k])``."""
        dists, idx = self.query(queries, k)
        w = 1.0 / np.clip(dists, 1e-12, None)
        w /= w.sum(axis=1, keepdims=True)
        return w.astype(np.float32), idx

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
        d2 = ((q[:, None, :] - self._points_host[None, :, :]) ** 2).sum(-1)
        idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
        dists = np.sqrt(np.take_along_axis(d2, idx, axis=1))
        w = 1.0 / np.clip(dists, 1e-12, None)
        w /= w.sum(axis=1, keepdims=True)
        vals = self._values_host[idx]
        return (w * vals).sum(axis=1)

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

For reference-scale clouds (N ≈ 2.5e5, d ≤ 3) one query costs ~2·N·d flops —
a few hundred kFLOP — so even millions of queries are tractable on one chip.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_TILE_N = 16384
DEFAULT_TILE_Q = 1024


@partial(jax.jit, static_argnames=("k", "tile_n", "tile_q"))
def _knn_search_padded(queries, points, points_sq, k: int,
                       tile_n: int, tile_q: int):
    """Top-k over pre-padded inputs.

    ``queries [Q, d]`` with Q a multiple of ``tile_q``; ``points [N, d]`` and
    ``points_sq [N]`` with N a multiple of ``tile_n`` (padding rows must have
    ``points_sq = +inf``). Returns ``(sq_dists [Q, k], idx [Q, k])``.
    """
    n = points.shape[0]
    n_tiles = n // tile_n
    points_t = points.T  # [d, N]

    def per_q_chunk(q):
        # q: [tile_q, d]
        def scan_tile(carry, tile_idx):
            best_scores, best_idx = carry
            p_t = jax.lax.dynamic_slice_in_dim(points_t, tile_idx * tile_n, tile_n, axis=1)
            p_sq = jax.lax.dynamic_slice_in_dim(points_sq, tile_idx * tile_n, tile_n)
            # ranking score: |p|^2 - 2 q.p  (monotone in true distance per query)
            scores = p_sq[None, :] - 2.0 * jnp.dot(q, p_t, preferred_element_type=jnp.float32)
            top_s, top_i = jax.lax.top_k(-scores, k)  # [tile_q, k]
            top_i = top_i + tile_idx * tile_n
            # merge with the running best
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class KNNIndex:
    """Device-resident point cloud supporting exact k-NN queries and
    inverse-distance-weighted regression (sklearn ``weights="distance"``
    semantics)."""

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

        n_pad = _round_up(self.n_points, self._tile_n)
        pts = np.zeros((n_pad, self.n_dim), dtype=np.float32)
        pts[:self.n_points] = centered
        sq = np.full((n_pad,), np.inf, dtype=np.float32)
        sq[:self.n_points] = (centered.astype(np.float64) ** 2).sum(axis=1)

        self._points = jnp.asarray(pts, dtype=dtype)
        self._points_sq = jnp.asarray(sq, dtype=jnp.float32)
        self._values = None
        if values is not None:
            self.set_values(values)

    def set_values(self, values) -> None:
        """Attach per-point values for :meth:`predict` (shape [N] or [N, C])."""
        values = np.asarray(values, dtype=np.float32)
        assert values.shape[0] == self.n_points
        self._values = jnp.asarray(values)

    def query(self, queries, k: int):
        """Exact k-NN: returns ``(dists [Q, k], idx [Q, k])`` as jnp arrays."""
        assert k <= self.n_points, \
            f"k={k} exceeds the number of indexed points ({self.n_points})."
        queries = np.asarray(queries) - self._shift
        q = queries.shape[0]
        q_pad = _round_up(max(q, 1), self._tile_q)
        qarr = np.zeros((q_pad, self.n_dim), dtype=np.float32)
        qarr[:q] = queries
        sq, idx = _knn_search_padded(
            jnp.asarray(qarr), self._points, self._points_sq, k,
            self._tile_n, self._tile_q)
        dists = jnp.sqrt(jnp.maximum(sq[:q], 0.0))
        return dists, idx[:q]

    def weights(self, queries, k: int):
        """Inverse-distance weights (normalized): ``(w [Q, k], idx [Q, k])``.

        Matches the reference export path (``export.py:428-429``):
        ``w = 1 / clamp(dist, 1e-12)`` normalized per row, which also
        reproduces sklearn's exact-match special case (a zero-distance
        neighbor's clamped weight dominates the row).
        """
        dists, idx = self.query(queries, k)
        w = 1.0 / jnp.clip(dists, min=1e-12)
        w = w / w.sum(axis=1, keepdims=True)
        return w, idx

    def predict(self, queries, k: int):
        """Inverse-distance-weighted regression at the query points.

        Equivalent to sklearn ``KNeighborsRegressor(n_neighbors=k,
        weights="distance").predict`` on the attached values.
        """
        assert self._values is not None, "No values attached; call set_values() first."
        w, idx = self.weights(queries, k)
        vals = self._values[idx]  # [Q, k] or [Q, k, C]
        if vals.ndim == 3:
            return jnp.einsum("qk,qkc->qc", w, vals)
        return jnp.einsum("qk,qk->q", w, vals)

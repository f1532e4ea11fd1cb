"""Multi-chip exact k-NN: point cloud sharded over the cell axis.

Each device holds a shard of the indexed points, computes its local top-k
with the same MXU-tiled score (``ops/knn.py``), then the per-device
candidates are ``all_gather``-ed (k·n_dev rows — tiny) and reduced to the
global top-k.  Queries are replicated; the heavy term (the [Q, N] score
matrix) is distributed, so both memory and FLOPs scale with 1/n_dev.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import CELL_AXIS, pad_to_multiple
from ..ops.knn import (MAX_QUERY_CHUNK, _bucket_pow2, _sort_neighbors,
                       _plan_grid, _grid_neighbor_table, _grid_query_margin,
                       _dilated_select, _overflow_contaminated)


@partial(jax.jit, static_argnames=("k",))
def _local_topk(queries, points, points_sq, k: int):
    """Exact local top-k by the expanded score (monotone in distance)."""
    scores = points_sq[None, :] - 2.0 * jnp.dot(
        queries, points.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    top_s, top_i = jax.lax.top_k(-scores, k)
    return top_s, top_i


class ShardedKNNIndex:
    """Exact k-NN over a point cloud sharded across a 1-D device mesh."""

    # same grid policy knobs as the single-chip index (``ops/knn.KNNIndex``)
    GRID_MIN_POINTS = 32768
    GRID_OCCUPANCY = 16
    GRID_CAPACITY = 64
    # per-DEVICE dilated-layout budget: the whole point of sharding the grid
    # rows is that total capacity scales with the mesh size
    GRID_DEVICE_BYTES = 1.5e9

    def __init__(self, points, mesh: Mesh, values=None):
        points = np.asarray(points, dtype=np.float32)
        self.n_points, self.n_dim = points.shape
        self.mesh = mesh
        self.n_shards = mesh.devices.size

        self._shift = points.mean(axis=0)
        centered = points - self._shift

        padded = pad_to_multiple(centered, self.n_shards)
        self._points_host = padded  # avoids a full-cloud readback per query
        self._n_padded = padded.shape[0]
        sq = np.full(self._n_padded, np.inf, dtype=np.float32)
        sq[:self.n_points] = (centered.astype(np.float64) ** 2).sum(axis=1)

        shard = NamedSharding(mesh, P(CELL_AXIS))
        self._points = jax.device_put(jnp.asarray(padded), shard)
        self._points_sq = jax.device_put(jnp.asarray(sq), shard)

        self._grid = None
        if self.n_points >= self.GRID_MIN_POINTS and self.n_dim in (2, 3):
            self._build_grid(centered)

        self._values = None
        if values is not None:
            self.set_values(values)

        self._query_fn = None
        self._k = None

    def _build_grid(self, centered: np.ndarray) -> None:
        """Row-sharded dilated bucket grid: the same host plan as the
        single-chip index (``ops/knn._plan_grid``), dilated so every row is
        SELF-CONTAINED (a cell's row holds its whole 3^d neighborhood), then
        row-sharded over the mesh — no halo exchange needed, and total grid
        capacity scales with the device count.  Member ids reference the
        cloud in its original (unsorted) order."""
        d = self.n_dim
        plan = _plan_grid(centered, self.n_points, self.n_points,
                          self.GRID_OCCUPANCY, self.GRID_CAPACITY)
        C, n_cells = plan["C"], plan["n_cells"]
        dil_bytes = (n_cells + 1) * (3 ** d) * C * (d + 2) * 4
        if dil_bytes > self.GRID_DEVICE_BYTES * self.n_shards:
            return

        nb = _grid_neighbor_table(plan["dims"], n_cells)
        dil_pts = plan["cell_pts"].reshape(n_cells + 1, C * d)[nb] \
            .reshape(n_cells + 1, -1)
        dil_cand = plan["cell_list"][nb].reshape(n_cells + 1, -1)
        # f32 0/1 like the single-chip layout: bool row gathers are ~2x
        # slower on device (see ops/knn._overflow_contaminated)
        dil_ovf = plan["overflow"].astype(np.float32)[nb]    # [rows, 3^d]

        # pad rows to a multiple of the mesh size with sentinel-row copies
        # (all-pad: huge coords, never exact) so the row shards are equal
        rows = n_cells + 1
        rows_pad = -(-rows // self.n_shards) * self.n_shards
        extra = rows_pad - rows
        if extra:
            dil_pts = np.concatenate([dil_pts, np.repeat(dil_pts[-1:],
                                                         extra, axis=0)])
            dil_cand = np.concatenate([dil_cand, np.repeat(dil_cand[-1:],
                                                           extra, axis=0)])
            dil_ovf = np.concatenate([dil_ovf, np.repeat(dil_ovf[-1:],
                                                         extra, axis=0)])

        shard = NamedSharding(self.mesh, P(CELL_AXIS))
        self._grid = {
            "h": plan["h"], "C": C, "n_cells": n_cells, "rows": rows_pad,
            "origin": jnp.asarray(plan["origin"], dtype=jnp.float32),
            "inv_h": jnp.float32(1.0 / plan["h"]),
            "dims": jnp.asarray(plan["dims"], dtype=jnp.int32),
            "dil_pts": jax.device_put(dil_pts, shard),
            "dil_cand": jax.device_put(dil_cand, shard),
            "dil_ovf": jax.device_put(dil_ovf, shard),
        }
        self._grid_fill = (plan["fill"], nb)

    def set_values(self, values) -> None:
        values = np.asarray(values, dtype=np.float32)
        assert values.shape[0] == self.n_points
        self._values = jnp.asarray(values)  # replicated (small)
        self._values_host = values
        if self._grid is not None and values.ndim == 1:
            (cells, pos, order), nb = self._grid_fill
            n_cells, C = self._grid["n_cells"], self._grid["C"]
            cell_vals = np.zeros((n_cells + 1, C), dtype=np.float32)
            cell_vals[cells, pos] = values[order]
            dil_vals = cell_vals[nb].reshape(n_cells + 1, -1)
            extra = self._grid["rows"] - (n_cells + 1)
            if extra:
                dil_vals = np.concatenate(
                    [dil_vals, np.repeat(dil_vals[-1:], extra, axis=0)])
            self._grid["dil_vals"] = jax.device_put(
                dil_vals, NamedSharding(self.mesh, P(CELL_AXIS)))

    def _build(self, k: int):
        n_local = self._n_padded // self.n_shards

        def kernel(queries, points, points_sq):
            # per-shard local top-k with global indices
            shard_idx = jax.lax.axis_index(CELL_AXIS)
            top_s, top_i = _local_topk(queries, points, points_sq, k)
            top_i = top_i + shard_idx * n_local
            # gather all shards' candidates: [n_shards * k] per query
            all_s = jax.lax.all_gather(top_s, CELL_AXIS, axis=1, tiled=True)
            all_i = jax.lax.all_gather(top_i, CELL_AXIS, axis=1, tiled=True)
            best_s, sel = jax.lax.top_k(all_s, k)
            best_i = jnp.take_along_axis(all_i, sel, axis=1)
            # canonical ascending (score, idx) order (ops/knn._sort_neighbors)
            return _sort_neighbors(-best_s, best_i)

        fn = shard_map(
            kernel, mesh=self.mesh,
            in_specs=(P(), P(CELL_AXIS), P(CELL_AXIS)),
            out_specs=(P(), P()), check_vma=False)
        self._query_fn = jax.jit(fn)
        self._k = k

    # per-chunk query width on the grid path (bounds the [Q, 3^d·C, d]
    # per-device gather temp, the same wall the single-chip 3D path hits)
    GRID_CHUNK = {2: 32768, 3: 8192}

    def _build_grid_query(self, k: int):
        """Row-sharded dilated-grid query kernel: each device answers the
        queries whose home cell falls in its contiguous flat-row range
        (same owner/psum combination as the engine's sharded epoch kernel,
        ``engine/tree.py::_build_epoch_fn_sharded``); non-owned lanes read
        one hot local row and are masked out of the psum.  Only the index
        block and the exactness bitmap come back — distances are
        recomputed host-side from the selected neighbors."""
        if getattr(self, "_grid_query_fns", None) is None:
            self._grid_query_fns = {}
        if k in self._grid_query_fns:
            return self._grid_query_fns[k]
        g = self._grid
        rows_per_dev = g["rows"] // self.n_shards
        n_sentinel = g["n_cells"]

        def kernel(queries, dil_pts, dil_cand, dil_ovf, origin, inv_h,
                   dims):
            me = jax.lax.axis_index(CELL_AXIS)
            flat, margin_sq = _grid_query_margin(queries, origin, inv_h, dims)
            own = (flat // rows_per_dev) == me
            lflat = jnp.where(own, flat - me * rows_per_dev, 0)
            sq, idx, _ = _dilated_select(queries, dil_pts, dil_cand,
                                         lflat, k)
            okq = own & (sq.max(axis=1) <= margin_sq) \
                & ~_overflow_contaminated(queries, dil_ovf[lflat],
                                          sq.max(axis=1), origin, inv_h,
                                          dims)
            # exactly one owner per query → psum reconstructs its values
            idx = jax.lax.psum(jnp.where(own[:, None], idx, 0), CELL_AXIS)
            ok = jax.lax.psum(okq.astype(jnp.int32), CELL_AXIS) > 0
            return idx, ok

        from .._backend import cached_jit
        # keyed on every closure constant (rows_per_dev, sentinel id, k)
        # plus the mesh shape — a fresh jax.jit object per index instance
        # would re-load its executable through the tunnel every run
        fn = cached_jit(
            ("shard_grid_query", k, self.n_dim, rows_per_dev, n_sentinel,
             tuple(self.mesh.devices.shape)),
            lambda: jax.jit(shard_map(
                kernel, mesh=self.mesh,
                in_specs=(P(), P(CELL_AXIS), P(CELL_AXIS), P(CELL_AXIS),
                          P(), P(), P()),
                out_specs=(P(), P()), check_vma=False)))
        self._grid_query_fns[k] = fn
        return fn

    def _query_full(self, q: np.ndarray, k: int) -> np.ndarray:
        """Sharded full-scan k-NN over centered queries; returns idx.

        Queries are chunked (≤ MAX_QUERY_CHUNK per device call — oversized
        single programs can crash the TPU worker) and padded to power-of-two
        buckets so the number of compiled shapes stays O(log Q); all chunks
        are dispatched before any readback so they pipeline through JAX
        async dispatch."""
        if self._query_fn is None or self._k != k:
            self._build(k)
        pending = []
        for lo in range(0, max(q.shape[0], 1), MAX_QUERY_CHUNK):
            chunk = q[lo:lo + MAX_QUERY_CHUNK]
            n = chunk.shape[0]
            qarr = np.zeros((_bucket_pow2(n, 256), self.n_dim),
                            dtype=np.float32)
            qarr[:n] = chunk
            pending.append(
                (n, self._query_fn(jnp.asarray(qarr), self._points,
                                   self._points_sq)))
        return np.concatenate([np.asarray(fut[1])[:n] for n, fut in pending])

    def query(self, queries, k: int):
        """Exact k-NN: ``(dists [Q, k], idx [Q, k])`` (numpy).

        Uses the row-sharded dilated grid when available (one self-contained
        row gather per query instead of a 1/n_dev slice of the full cloud);
        queries whose k-th neighbor cannot be certified exact from the 3^d
        neighborhood (margin/overflow test, identical to the single-chip
        grid path) are re-answered by the sharded full scan, so results are
        exact and in canonical ascending (distance², index) order either
        way."""
        q = np.asarray(queries, dtype=np.float32) - self._shift
        n = q.shape[0]
        g = self._grid
        use_grid = (g is not None and n > 0
                    and k <= (3 ** self.n_dim) * g["C"])
        if use_grid:
            fn = self._build_grid_query(k)
            chunk = self.GRID_CHUNK[self.n_dim]
            pending = []
            for lo in range(0, n, chunk):
                piece = q[lo:lo + chunk]
                m = piece.shape[0]
                qarr = np.zeros((_bucket_pow2(m, 256), self.n_dim),
                                dtype=np.float32)
                qarr[:m] = piece
                pending.append((m, fn(jnp.asarray(qarr), g["dil_pts"],
                                      g["dil_cand"], g["dil_ovf"],
                                      g["origin"], g["inv_h"], g["dims"])))
            idx = np.concatenate(
                [np.asarray(p[0])[:m] for m, p in pending])
            ok = np.concatenate([np.asarray(p[1])[:m] for m, p in pending])
            bad = np.nonzero(~ok)[0]
            self.last_fallback = int(bad.size)
            if bad.size:
                idx[bad] = self._query_full(q[bad], k)
        else:
            self.last_fallback = n if g is not None else 0
            idx = self._query_full(q, k)
        # exact distances recomputed host-side on the selected neighbors only
        delta = q[:, None, :] - self._points_host[idx]
        dists = np.sqrt(np.maximum((delta * delta).sum(-1), 0.0))
        return dists, idx

    def weights(self, queries, k: int):
        """Normalized inverse-distance weights (sklearn semantics)."""
        dists, idx = self.query(queries, k)
        w = 1.0 / np.clip(dists, 1e-12, None)
        w /= w.sum(axis=1, keepdims=True)
        return w, idx

    def predict(self, queries, k: int):
        assert self._values is not None
        w, idx = self.weights(queries, k)
        vals = self._values_host[idx]
        if vals.ndim == 3:
            return np.einsum("qk,qkc->qc", w, vals)
        return np.einsum("qk,qk->q", w, vals)

    def predict_host(self, queries, k: int) -> np.ndarray:
        """Host-side exact variant for tiny query counts (mirrors
        ``KNNIndex.predict_host``; e.g. the root-cell gain)."""
        assert self._values is not None
        q = np.asarray(queries, dtype=np.float64) - self._shift
        pts = self._points_host[:self.n_points]
        d2 = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
        dists = np.sqrt(np.take_along_axis(d2, idx, axis=1))
        w = 1.0 / np.clip(dists, 1e-12, None)
        w /= w.sum(axis=1, keepdims=True)
        vals = self._values_host[idx]
        if vals.ndim == 3:
            return (w[..., None] * vals).sum(axis=1)
        return (w * vals).sum(axis=1)

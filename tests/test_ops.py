"""Unit tests for the device primitives: morton codes, exact k-NN,
interpolation, SVD rank selection."""
import numpy as np
import pytest

from sparsespatialsampling_tpu.ops import morton
from sparsespatialsampling_tpu.ops.knn import KNNIndex, _bucket_pow2
from sparsespatialsampling_tpu.ops.interpolate import interpolate_data
from sparsespatialsampling_tpu.ops.svd import optimal_rank, economy_svd, randomized_svd


class TestMorton:
    @pytest.mark.parametrize("d", [2, 3])
    def test_encode_is_injective(self, d):
        rng = np.random.default_rng(0)
        coords = rng.integers(0, 1 << 10, size=(5000, d)).astype(np.uint64)
        codes = morton.encode(coords)
        uniq_coords = np.unique(coords, axis=0)
        assert np.unique(codes).size == uniq_coords.shape[0]

    def test_encode_order_2d(self):
        # Morton order of the 2x2 block: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
        coords = np.asarray([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=np.uint64)
        np.testing.assert_array_equal(morton.encode(coords), [0, 1, 2, 3])

    @pytest.mark.parametrize("d", [2, 3])
    def test_anchor_nesting(self, d):
        """A child's anchor range must be inside its parent's range."""
        depth = morton.MAX_DEPTH[d]
        rng = np.random.default_rng(1)
        parent = rng.integers(0, 1 << 5, size=(100, d)).astype(np.int64)
        level = np.full(100, 5)
        p_anchor = morton.anchor(parent.astype(np.uint64), level, depth)
        p_size = morton.range_size(level, d, depth)
        # all 2^d children at level 6
        for off in range(2 ** d):
            bits = [(off >> i) & 1 for i in range(d)]
            child = parent * 2 + np.asarray(bits, dtype=np.int64)
            c_anchor = morton.anchor(child.astype(np.uint64), level + 1, depth)
            assert (c_anchor >= p_anchor).all()
            assert (c_anchor < p_anchor + p_size).all()

    @pytest.mark.parametrize("d", [2, 3])
    def test_node_keys_roundtrip(self, d):
        rng = np.random.default_rng(2)
        depth = 10
        level = rng.integers(1, depth + 1, size=200)
        coords = np.asarray([rng.integers(0, 1 << l, size=d) for l in level],
                            dtype=np.int64)
        offsets = np.stack(np.meshgrid(*([np.arange(2)] * d), indexing="ij"),
                           axis=-1).reshape(-1, d)
        keys = morton.node_keys(coords, level, offsets, depth)
        decoded = morton.decode_node_keys(keys.ravel(), d, depth)
        expected = ((coords[:, None, :] + offsets[None, :, :])
                    << (depth - level)[:, None, None]).reshape(-1, d)
        np.testing.assert_array_equal(decoded, expected)

    def test_shared_corner_same_key(self):
        """Adjacent cells at different levels share node keys at their common
        corner — the topological dedup guarantee."""
        depth = 8
        offsets = np.asarray([[0, 0], [0, 1], [1, 1], [1, 0]])
        # cell (0,0) at level 1 and cell (2,2) at level 2 touch at (0.5, 0.5)
        k1 = morton.node_keys(np.asarray([[0, 0]]), np.asarray([1]), offsets, depth)
        k2 = morton.node_keys(np.asarray([[2, 2]]), np.asarray([2]), offsets, depth)
        shared = set(k1.ravel()) & set(k2.ravel())
        assert len(shared) == 1


class TestKNN:
    def test_bucket_pow2(self):
        assert _bucket_pow2(1, 1024) == 1024
        assert _bucket_pow2(1024, 1024) == 1024
        assert _bucket_pow2(1025, 1024) == 2048
        assert _bucket_pow2(5000, 1024) == 8192

    @pytest.mark.parametrize("d,k", [(2, 8), (3, 26)])
    def test_query_matches_bruteforce(self, d, k):
        rng = np.random.default_rng(3)
        pts = rng.uniform(size=(2000, d))
        q = rng.uniform(size=(100, d))
        index = KNNIndex(pts)
        dists, idx = index.query(q, k)
        dists, idx = np.asarray(dists), np.asarray(idx)

        full = np.linalg.norm(q[:, None, :] - pts[None, :, :], axis=-1)
        ref_d = np.sort(full, axis=1)[:, :k]
        np.testing.assert_allclose(np.sort(dists, 1), ref_d, rtol=1e-4, atol=1e-5)

    def test_exact_match_weight_dominates(self):
        """A query exactly on an indexed point must get ~all weight there
        (sklearn weights='distance' semantics via the clamp)."""
        pts = np.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0],
                          [0.5, 0.5], [0.2, 0.8], [0.8, 0.2], [0.3, 0.3]])
        vals = np.arange(8.0)
        index = KNNIndex(pts, values=vals)
        pred = np.asarray(index.predict(pts[4:5], 4))
        assert abs(pred[0] - vals[4]) < 1e-4

    def test_small_cloud_k_equals_n(self):
        pts = np.random.default_rng(4).uniform(size=(10, 2))
        index = KNNIndex(pts)
        dists, idx = index.query(pts[:3], 10)
        assert sorted(np.asarray(idx)[0].tolist()) == list(range(10))

    def test_weights_device_matches_host(self):
        """The device-resident weight cache must agree with the host path
        (same neighbors, same normalized IDW weights) including fallback
        rows."""
        rng = np.random.default_rng(31)
        pts = rng.uniform(size=(40_000, 2))
        q = rng.uniform(-0.02, 1.02, size=(700, 2))  # some out-of-bbox rows
        index = KNNIndex(pts)
        w_h, i_h = index.weights(q, 8)
        w_d, i_d, n = index.weights_device(q, 8)
        assert n == 700
        np.testing.assert_array_equal(np.sort(np.asarray(i_d)[:n], 1),
                                      np.sort(i_h, 1))
        np.testing.assert_allclose(np.sort(np.asarray(w_d)[:n], 1),
                                   np.sort(w_h, 1), rtol=1e-5, atol=1e-7)

    def test_predict_host_multichannel(self):
        """predict_host must accept [N, C] values like predict does."""
        rng = np.random.default_rng(6)
        pts = rng.uniform(size=(500, 2))
        vals = rng.normal(size=(500, 3)).astype(np.float32)
        q = rng.uniform(size=(20, 2))
        index = KNNIndex(pts, values=vals)
        host = index.predict_host(q, 8)
        dev = np.asarray(index.predict(q, 8))
        assert host.shape == (20, 3)
        np.testing.assert_allclose(host, dev, rtol=1e-4, atol=1e-5)


class TestInterpolate:
    def test_matches_manual_gather(self):
        rng = np.random.default_rng(5)
        data = rng.normal(size=(100, 3, 7)).astype(np.float32)
        idx = rng.integers(0, 100, size=(40, 5)).astype(np.int32)
        w = rng.uniform(size=(40, 5)).astype(np.float32)
        w /= w.sum(1, keepdims=True)
        out = interpolate_data(w, idx, data)
        ref = np.einsum("mk,mkcs->mcs", w, data[idx])
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_chunked_equals_unchunked(self):
        rng = np.random.default_rng(6)
        data = rng.normal(size=(50, 1, 4)).astype(np.float32)
        idx = rng.integers(0, 50, size=(1000, 8)).astype(np.int32)
        w = rng.uniform(size=(1000, 8)).astype(np.float32)
        w /= w.sum(1, keepdims=True)
        np.testing.assert_allclose(
            interpolate_data(w, idx, data, chunk_size=128),
            interpolate_data(w, idx, data, chunk_size=10**6), rtol=1e-6)


class TestSVDRank:
    def test_optimal_rank_pure_noise_small(self):
        rng = np.random.default_rng(7)
        a = rng.normal(size=(400, 80)).astype(np.float32)
        _, s, _ = economy_svd(a)
        r = optimal_rank(s, a.shape)
        assert r < 40  # noise: most modes rejected

    def test_randomized_matches_economy_topk(self):
        rng = np.random.default_rng(8)
        u = rng.normal(size=(1000, 4)); v = rng.normal(size=(4, 60))
        a = ((u * [50, 20, 8, 3]) @ v).astype(np.float32)
        _, s_e, _ = economy_svd(a)
        _, s_r, _ = randomized_svd(a, rank=4)
        np.testing.assert_allclose(s_r, s_e[:4], rtol=1e-3)

    def test_tall_skinny_path_matches_lapack(self):
        """The Gram/snapshot tall-skinny path (m >= 8n, m >= 4096) must agree
        with a float64 LAPACK SVD across 4 decades of spectrum decay."""
        rng = np.random.default_rng(9)
        a = (rng.standard_normal((5000, 24))
             * np.logspace(0, -4, 24)[None, :]).astype(np.float32)
        a = a @ rng.standard_normal((24, 24)).astype(np.float32)
        u, s, v = economy_svd(a)
        s_ref = np.linalg.svd(a.astype(np.float64), compute_uv=False)
        # singular values and V come from the float64 Gram path: strict
        np.testing.assert_allclose(s, s_ref, atol=1e-5 * s_ref[0])
        np.testing.assert_allclose(v.T @ v, np.eye(24), atol=1e-4)
        # U is an f32 matmul: mode i carries ~eps32·sigma1/sigma_i relative
        # contamination (5e-3 at this spectrum's weakest decade) — physically
        # negligible for CFD modes and identical to any f32 SVD's mode noise
        np.testing.assert_allclose(u.T @ u, np.eye(24), atol=2e-2)
        np.testing.assert_allclose((u * s) @ v.T, a,
                                   atol=1e-5 * s_ref[0])


class TestChunking:
    def test_multi_chunk_query_matches_single(self, monkeypatch):
        """Crossing the MAX_QUERY_CHUNK boundary must not change results."""
        import sparsespatialsampling_tpu.ops.knn as knn_mod
        rng = np.random.default_rng(9)
        pts = rng.uniform(size=(3000, 2))
        q = rng.uniform(size=(700, 2))
        index = KNNIndex(pts)
        d_ref, i_ref = index.query(q, 8)

        monkeypatch.setattr(knn_mod, "MAX_QUERY_CHUNK", 256)
        d_chunk, i_chunk = index.query(q, 8)
        np.testing.assert_allclose(d_chunk, d_ref, rtol=1e-6)
        np.testing.assert_array_equal(i_chunk, i_ref)

    def test_running_merge_branch_matches_bruteforce(self):
        """Force the collect=False running-merge path (n_tiles*k > 8192)
        with a tiny tile size and verify exactness."""
        rng = np.random.default_rng(10)
        n, k = 45_056, 26                    # 352 tiles of 128 → 9152 > 8192
        pts = rng.uniform(size=(n, 2)).astype(np.float32)
        q = rng.uniform(0.2, 0.8, size=(50, 2)).astype(np.float32)
        index = KNNIndex(pts, tile_n=128)
        assert index._tile_n == 128
        dists, _ = index.query(q, k)

        full = np.linalg.norm(q[:, None, :].astype(np.float64)
                              - pts[None, :, :].astype(np.float64), axis=-1)
        ref = np.sort(full, axis=1)[:, :k]
        np.testing.assert_allclose(np.sort(dists, 1), ref, rtol=1e-3, atol=1e-5)

    def test_epoch_chunking_equivalent_grid(self, monkeypatch):
        """Refinement must produce the identical grid when the fused epoch
        kernel is forced to split every iteration into many tiny chunks."""
        import sparsespatialsampling_tpu.engine.tree as tree_mod
        from sparsespatialsampling_tpu.engine.tree import SamplingTree
        from sparsespatialsampling_tpu.geometry import CubeGeometry

        rng = np.random.default_rng(11)
        xy = rng.uniform(size=(4000, 2))
        metric = np.exp(-((xy[:, 0] - 0.5) ** 2 + (xy[:, 1] - 0.5) ** 2) / 0.05)

        def build():
            st = SamplingTree(xy, metric,
                              [CubeGeometry("domain", True, [0, 0], [1, 1])],
                              uniform_level=3, n_cells=800)
            st.refine()
            return st.all_centers, st.all_levels

        c_ref, l_ref = build()
        monkeypatch.setitem(tree_mod._EPOCH_CHUNK, 2, 64)
        c_chunk, l_chunk = build()
        np.testing.assert_allclose(c_chunk, c_ref)
        np.testing.assert_array_equal(l_chunk, l_ref)


class TestBucketGrid:
    def test_grid_matches_bruteforce_uniform(self, monkeypatch):
        monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
        rng = np.random.default_rng(12)
        pts = rng.uniform(size=(20_000, 2))
        q = rng.uniform(-0.02, 1.02, size=(800, 2))   # incl. out-of-bbox
        index = KNNIndex(pts)
        assert index._grid is not None
        dists, idx = index.query(q, 8)
        full = np.linalg.norm(q[:, None, :].astype(np.float32)
                              - pts[None, :, :].astype(np.float32), axis=-1)
        ref = np.sort(full, axis=1)[:, :8]
        np.testing.assert_allclose(np.sort(dists, 1), ref, rtol=1e-4, atol=1e-6)

    def test_grid_matches_bruteforce_clustered(self, monkeypatch):
        """Heavily clustered cloud: overflowing cells must fall back exactly."""
        monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
        rng = np.random.default_rng(13)
        pts = np.concatenate([rng.uniform(size=(5000, 2)),
                              rng.normal([0.5, 0.5], 0.005, size=(15_000, 2))])
        q = np.concatenate([rng.uniform(size=(300, 2)),
                            rng.normal([0.5, 0.5], 0.01, size=(300, 2))])
        index = KNNIndex(pts)
        dists, idx = index.query(q, 8)
        full = np.linalg.norm(q[:, None, :].astype(np.float32)
                              - pts[None, :, :].astype(np.float32), axis=-1)
        ref = np.sort(full, axis=1)[:, :8]
        np.testing.assert_allclose(np.sort(dists, 1), ref, rtol=1e-4, atol=1e-6)

    def test_grid_predict_matches_fullscan(self, monkeypatch):
        monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
        rng = np.random.default_rng(14)
        pts = rng.uniform(size=(30_000, 3))
        vals = np.sin(pts.sum(1))
        q = rng.uniform(size=(500, 3))
        grid_index = KNNIndex(pts, values=vals)
        assert grid_index._grid is not None
        pred_grid = grid_index.predict(q, 26)
        pred_full = grid_index._full_scan(
            np.asarray(q, np.float64) - grid_index._shift, 26, "predict")
        np.testing.assert_allclose(pred_grid, pred_full, rtol=1e-5, atol=1e-6)

    def test_grid_predict_vector_matches_fullscan(self, monkeypatch):
        """Multi-channel values must route through the dilated grid path and
        agree with the exact full scan (pointwise value gathers make the
        scalar and multi-channel cases share one kernel)."""
        monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
        rng = np.random.default_rng(15)
        pts = rng.uniform(size=(30_000, 3))
        vals = np.stack([np.sin(pts.sum(1)), np.cos(pts[:, 0] * 3),
                         pts[:, 1] ** 2], axis=1)
        q = rng.uniform(size=(500, 3))
        grid_index = KNNIndex(pts, values=vals)
        assert grid_index._grid is not None
        assert "dil_pts" in grid_index._grid
        pred_grid = grid_index.predict(q, 26)
        pred_full = grid_index._full_scan(
            np.asarray(q, np.float64) - grid_index._shift, 26, "predict")
        assert pred_grid.shape == (500, 3)
        np.testing.assert_allclose(pred_grid, pred_full, rtol=1e-5, atol=1e-6)

    def test_grid_predict_vector_after_scalar(self, monkeypatch):
        """Re-attaching multichannel values after scalar ones must produce
        correct vector predictions (once a stale-scalar-layout trap)."""
        monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
        rng = np.random.default_rng(16)
        pts = rng.uniform(size=(8_000, 2))
        q = rng.uniform(size=(200, 2))
        index = KNNIndex(pts, values=np.sin(pts.sum(1)))
        index.predict(q, 8)
        vec = np.stack([pts[:, 0], pts[:, 1] * 2], axis=1)
        index.set_values(vec)
        pred = index.predict(q, 8)
        pred_full = index._full_scan(
            np.asarray(q, np.float64) - index._shift, 8, "predict")
        assert pred.shape == (200, 2)
        np.testing.assert_allclose(pred, pred_full, rtol=1e-5, atol=1e-6)

    def test_dilated_compaction_no_truncation(self, monkeypatch):
        """The dilated rows are sliced to the max occupied candidate width
        (``_dil_keep``, bound computed by ``_max_dilated_occupancy``) — the
        slice is only bit-exact if it never drops a REAL candidate.  Pin
        that: the bound must equal the exact per-row neighborhood member
        counts (recomputed independently from the neighbor table), and every
        compacted row must hold exactly that many real slots."""
        from sparsespatialsampling_tpu.ops.knn import _max_dilated_occupancy
        monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
        rng = np.random.default_rng(21)
        # clustered cloud -> strongly non-uniform occupancy
        pts = np.concatenate([
            rng.uniform(size=(6000, 2)),
            rng.normal([0.7, 0.3], 0.02, size=(6000, 2))])
        index = KNNIndex(pts, values=np.sin(pts.sum(1)))
        g = index._grid
        assert g is not None and "dil_cand" in g
        dims = np.asarray(g["dims"])
        n_cells = int(np.prod(dims))
        # _grid_fill is the device-derived grouping of ALL points (pads
        # carry the sentinel row, over-capacity members a pos >= C whose
        # scatter is dropped) — filter to the entries that actually landed
        # in the blocked layout, mirroring the host plan's ``keep``
        cells_all = np.asarray(index._grid_fill[0])
        pos_all = np.asarray(index._grid_fill[1])
        cells = cells_all[(cells_all < n_cells) & (pos_all < g["C"])]
        occ = _max_dilated_occupancy(
            {"dims": dims, "n_cells": n_cells, "fill": (cells,)})
        # independent exact occupancy: capped member counts summed over each
        # row's 3^d neighborhood via the neighbor table (sentinel row -> 0)
        # cap per-cell counts at the plan's slot capacity C: if the grid
        # build's storage-cap early exit ever left overflowing cells, the
        # stored rows hold at most C members each — the uncapped bincount
        # would overstate the reachable occupancy and fail spuriously
        counts = np.minimum(
            np.bincount(cells, minlength=n_cells + 1)[:n_cells], g["C"])
        counts_ext = np.append(counts, 0)
        nc = counts_ext[np.asarray(g["_nb"])].sum(axis=1)
        assert occ == int(nc.max())
        keep = g["_dil_keep"]
        assert keep >= occ
        cand = np.asarray(g["dil_cand"])
        assert cand.shape[1] == keep
        real = (cand < index.n_points).sum(axis=1)   # pad slots sort last
        np.testing.assert_array_equal(real, nc)      # zero truncation

    def test_grid_fullscan_tie_break_bitwise(self, monkeypatch):
        """Exact f32 distance TIES at the k-boundary (structured lattices,
        common in CFD meshes) must resolve identically — by ascending global
        point index — on the grid and full-scan paths, keeping predictions
        bitwise equal (the +8 tie slack in _topk_canonical)."""
        monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
        xs = np.arange(64, dtype=np.float64)
        pts = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
        rng = np.random.default_rng(17)
        vals = rng.normal(size=pts.shape[0])
        # queries AT lattice points: 4 equidistant neighbors at distance 1,
        # 4 at sqrt(2), ... -> the k=8 boundary always lands inside a tie
        q = pts[rng.choice(pts.shape[0], 128, replace=False)]
        index = KNNIndex(pts, values=vals)
        assert index._grid is not None
        pred_grid = index.predict(q, 8)
        assert index.last_fallback < q.shape[0], "no query used the grid"
        pred_full = index._full_scan(
            np.asarray(q, np.float64) - index._shift, 8, "predict")
        np.testing.assert_array_equal(np.asarray(pred_grid),
                                      np.asarray(pred_full))

    def test_neighbor_table_device_matches_host(self):
        """The device iota twin of the host neighbor table must agree for
        every (dims, sentinel) combination the grid planner can emit."""
        from sparsespatialsampling_tpu.ops.knn import (
            _grid_neighbor_table, _neighbor_table_jit)
        for dims in ([7, 5], [1, 9], [4, 9, 6], [1, 1, 1], [17, 2, 31]):
            dims_a = np.asarray(dims, dtype=np.int64)
            n = int(np.prod(dims_a))
            host = _grid_neighbor_table(dims_a, n)
            dev = np.asarray(_neighbor_table_jit(tuple(dims), n, len(dims)))
            np.testing.assert_array_equal(host, dev)

    def test_device_grid_build_matches_host_plan(self, monkeypatch):
        """cell_list / cell_vals / cell_pts assembled on device from the fill
        triplet must equal the host-assembled plan arrays bit for bit."""
        from sparsespatialsampling_tpu.ops.knn import _plan_grid
        monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
        rng = np.random.default_rng(21)
        pts = rng.uniform(size=(9_000, 3))
        vals = rng.normal(size=(9_000, 2)).astype(np.float32)
        index = KNNIndex(pts, values=vals)
        sorted_pts = (pts - index._shift)[index._perm]
        plan = _plan_grid(sorted_pts, index.n_points, index._pad_idx,
                          index.GRID_OCCUPANCY, index.GRID_CAPACITY,
                          host_arrays=True)
        np.testing.assert_array_equal(
            np.asarray(index._grid["cell_list"]), plan["cell_list"])
        np.testing.assert_array_equal(
            np.asarray(index._grid["cell_pts"]), plan["cell_pts"])
        c, p, o = plan["fill"]
        ref = np.zeros(plan["cell_list"].shape + (2,), np.float32)
        ref[c, p] = vals[index._perm][o]
        np.testing.assert_array_equal(
            np.asarray(index._grid["cell_vals"]), ref)

    def test_engine_grid_epoch_equivalent(self, monkeypatch):
        """Refinement grids must be identical with and without the bucket
        grid in the fused epoch kernel."""
        monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
        from sparsespatialsampling_tpu.engine.tree import SamplingTree
        from sparsespatialsampling_tpu.geometry import CubeGeometry

        rng = np.random.default_rng(15)
        xy = rng.uniform(size=(40_000, 2))
        metric = np.exp(-((xy[:, 0] - 0.5) ** 2 + (xy[:, 1] - 0.5) ** 2) / 0.03)

        def build():
            st = SamplingTree(xy, metric,
                              [CubeGeometry("domain", True, [0, 0], [1, 1])],
                              uniform_level=3, n_cells=1500)
            st.refine()
            return st.all_centers, st.all_levels

        c_grid, l_grid = build()
        monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 10 ** 12)  # grid off
        c_full, l_full = build()
        np.testing.assert_allclose(c_grid, c_full)
        np.testing.assert_array_equal(l_grid, l_full)


class TestPackedReadback:
    def test_shapes_dtypes_roundtrip(self):
        """packed_readback returns host copies identical to per-array
        np.asarray for mixed shapes within one dtype."""
        import jax.numpy as jnp
        from sparsespatialsampling_tpu.ops.transfer import packed_readback
        rng = np.random.default_rng(12)
        for dtype in (np.int32, np.float32, np.bool_):
            arrs = [rng.integers(0, 2, (7, 3)).astype(dtype),
                    rng.integers(0, 2, (128, 5)).astype(dtype),
                    rng.integers(0, 2, (1,)).astype(dtype)]
            outs = packed_readback([jnp.asarray(a) for a in arrs])
            assert len(outs) == len(arrs)
            for a, o in zip(arrs, outs):
                assert o.shape == a.shape and o.dtype == a.dtype
                np.testing.assert_array_equal(o, a)

    def test_single_buffer_passthrough(self):
        import jax.numpy as jnp
        from sparsespatialsampling_tpu.ops.transfer import packed_readback
        a = np.arange(12, dtype=np.int32).reshape(3, 4)
        (out,) = packed_readback([jnp.asarray(a)])
        np.testing.assert_array_equal(out, a)


class TestPallasTopK:
    def test_matches_lax_topk_with_ties(self):
        """The TPU selection kernel must implement lax.top_k(-x) semantics
        exactly: ascending values, first-occurrence (lowest-slot) ties —
        the canonical order contract of the sorted dilated rows.  Runs in
        the Pallas interpreter on CPU."""
        import jax
        import jax.numpy as jnp
        from sparsespatialsampling_tpu.ops.pallas_topk import topk_smallest
        rng = np.random.default_rng(11)
        x = rng.normal(size=(96, 160)).astype(np.float32)
        x[3, 10] = x[3, 50] = x[3, 5]    # in-set ties
        x[7, :] = 1.0                     # whole-row tie
        x[11, 100:] = np.inf              # padded candidates
        vals, sel = topk_smallest(jnp.asarray(x), 9, interpret=True)
        tv, ts = jax.lax.top_k(-jnp.asarray(x), 9)
        np.testing.assert_array_equal(np.asarray(vals), -np.asarray(tv))
        np.testing.assert_array_equal(np.asarray(sel), np.asarray(ts))


class TestIdxDeltaPack:
    """Delta-compressed [Q, k] index readback (`_pack_idx_delta`): the
    export weight cache's dominant transfer rides uint16 row deltas; rows
    whose spread exceeds uint16 must be flagged and fixed up exactly."""

    def test_pack_unpack_roundtrip_with_overflow(self):
        import jax.numpy as jnp
        from sparsespatialsampling_tpu.ops.knn import (
            _pack_idx_delta, _unpack_idx_delta)
        rng = np.random.default_rng(5)
        for k in (7, 26):  # odd k exercises the pad lane
            base = rng.integers(0, 1_000_000, size=64).astype(np.int64)
            idx = (base[:, None]
                   + rng.integers(0, 60_000, size=(64, k))).astype(np.int32)
            idx[3] = [10_000_000 + 70_000 * j for j in range(k)]  # overflow
            ok = np.ones(64, dtype=bool)
            ok[7] = False
            rows = np.asarray(_pack_idx_delta(jnp.asarray(idx),
                                              jnp.asarray(ok)))
            got, got_ok, fits = _unpack_idx_delta(rows, k)
            np.testing.assert_array_equal(got_ok, ok)
            assert not fits[3] and fits[:3].all() and fits[4:].all()
            np.testing.assert_array_equal(got[fits], idx[fits])

    def test_grid_exact_under_kboundary_value_ties(self):
        """Duplicated points make the k-th and (k+1)-th distances exactly
        equal — the selection must resolve such k-boundary value ties
        canonically (ascending candidate index among equal distances) on
        every path: first-minimum extraction on sorted dilated rows and
        the 2-key canonical sort both guarantee it by construction."""
        from sparsespatialsampling_tpu.ops.knn import KNNIndex
        rng = np.random.default_rng(7)
        pts = rng.uniform(size=(40_000, 3))
        # a run of identical coordinates straddling the k=8 boundary
        pts[100:140] = pts[100]
        q = pts[100:101] + np.asarray([[2e-4, 0.0, 0.0]])
        obj = KNNIndex(pts)
        dist, idx = obj.query(q, 8)
        # all 8 results are the duplicated coordinate, lowest indices first
        np.testing.assert_array_equal(idx[0], np.arange(100, 108))
        np.testing.assert_allclose(dist[0], 2e-4, rtol=1e-4)
        # weights path: equal distances → equal weights, canonical indices
        w, idx2 = obj.weights(q, 8)
        np.testing.assert_array_equal(idx2[0], np.arange(100, 108))
        np.testing.assert_allclose(w[0], 1.0 / 8, rtol=1e-6)

    def test_grid_query_idx_exact_across_uint16_seams(self):
        """131k-point cloud produces real uint16-overflow rows (verified to
        hit the fixup gather); grid query_idx must still be exact."""
        from sparsespatialsampling_tpu.ops import knn as K
        rng = np.random.default_rng(1)
        pts = rng.uniform(size=(131_072, 3))
        q = rng.uniform(size=(2048, 3))
        obj = K.KNNIndex(pts)
        counts = {"mis": 0}
        orig = K._unpack_idx_delta

        def spy(rows, k):
            idx, ok, fits = orig(rows, k)
            counts["mis"] += int((ok & ~fits).sum())
            return idx, ok, fits

        K._unpack_idx_delta = spy
        try:
            w, idx = obj.weights(q, 26)
        finally:
            K._unpack_idx_delta = orig
        assert counts["mis"] > 0, "config no longer exercises the fixup"
        sub = np.random.default_rng(2).choice(2048, 40, replace=False)
        d = ((q[sub, None, :] - pts[None, :, :]) ** 2).sum(-1)
        ref = np.argsort(d, axis=1, kind="stable")[:, :26]
        for i, s in enumerate(sub):
            assert set(idx[s]) == set(ref[i])
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)


class TestCachedJit:
    """Process-global executable sharing (`_backend.cached_jit`) — wrong
    cache keys would silently evaluate one geometry's mask with another's
    compiled constants."""

    def test_geometry_cache_keys_distinguish_content(self):
        from sparsespatialsampling_tpu.geometry import (CubeGeometry,
                                                        SphereGeometry)
        a = CubeGeometry("a", True, [0, 0], [1, 1])
        b = CubeGeometry("b", True, [0, 0], [1, 1])          # same content
        c = CubeGeometry("c", True, [0, 0], [1, 2])          # different box
        d = CubeGeometry("d", False, [0, 0], [1, 1])         # polarity flip
        s = SphereGeometry("s", True, [0.5, 0.5], 0.5)
        assert a.cache_key == b.cache_key
        assert a.cache_key != c.cache_key
        assert a.cache_key != d.cache_key
        assert a.cache_key != s.cache_key

    def test_cached_jit_shares_and_splits(self):
        from sparsespatialsampling_tpu._backend import cached_jit
        made = []

        def make():
            made.append(1)
            return object()

        f1 = cached_jit(("t_ops_cj", 1), make)
        f2 = cached_jit(("t_ops_cj", 1), make)
        f3 = cached_jit(("t_ops_cj", 2), make)
        assert f1 is f2 and f1 is not f3 and len(made) == 2
        # None anywhere in the (nested) key disables sharing
        g1 = cached_jit(("t_ops_cj", (None,)), make)
        g2 = cached_jit(("t_ops_cj", (None,)), make)
        assert g1 is not g2
        h1 = cached_jit(None, make)
        h2 = cached_jit(None, make)
        assert h1 is not h2

    def test_batched_validity_shared_executable_masks_correctly(self):
        """Two BatchedValidity instances over same-content geometries share
        one jitted fn; a different-content instance must NOT."""
        import numpy as np
        from sparsespatialsampling_tpu.geometry import CubeGeometry
        from sparsespatialsampling_tpu.engine.tree import BatchedValidity

        def mk(upper):
            return BatchedValidity(
                [CubeGeometry("dom", True, [0.0, 0.0], [1.0, upper])])

        bv1, bv2, bv3 = mk(1.0), mk(1.0), mk(2.0)
        assert bv1._cheap_fn is bv2._cheap_fn
        assert bv1._cheap_fn is not bv3._cheap_fn
        # cell fully above y=1: valid (nodes inside) for the tall domain,
        # invalid (no node inside) for the unit domain
        nodes = np.asarray([[[0.4, 1.4], [0.6, 1.4], [0.6, 1.2],
                             [0.4, 1.2]]], dtype=np.float64)
        assert not bool(bv3(nodes)[0])
        assert bool(bv1(nodes)[0])

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

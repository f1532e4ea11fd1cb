"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(conftest sets ``xla_force_host_platform_device_count=8``)."""
import numpy as np
import pytest
import jax

from sparsespatialsampling_tpu.parallel import (
    make_mesh, ShardedKNNIndex, sharded_interpolate, distributed_rsvd)
from sparsespatialsampling_tpu.ops.knn import KNNIndex
from sparsespatialsampling_tpu.ops.svd import randomized_svd


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_knn_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(5000, 3)).astype(np.float32)
    q = rng.uniform(0.1, 0.9, size=(200, 3)).astype(np.float32)

    single = KNNIndex(pts)
    d_ref, i_ref = single.query(q, 8)
    d_ref = np.asarray(d_ref)

    sharded = ShardedKNNIndex(pts, mesh)
    d_shard, i_shard = sharded.query(q, 8)

    # index sets may differ on exact ties; distances must match
    np.testing.assert_allclose(np.sort(d_shard, 1), np.sort(d_ref, 1),
                               rtol=1e-4, atol=1e-5)


def test_sharded_grid_query_matches_fullscan(mesh, monkeypatch):
    """The row-sharded dilated grid now serves ``query`` too (previously
    built but only wired into the engine's epoch kernel): results must
    match the sharded full scan, with the exact-fallback only firing for
    the rows whose 3^d-neighborhood certificate fails."""
    monkeypatch.setattr(ShardedKNNIndex, "GRID_MIN_POINTS", 1000)
    rng = np.random.default_rng(4)
    pts = rng.uniform(size=(6000, 2)).astype(np.float32)
    q = rng.uniform(0.05, 0.95, size=(700, 2)).astype(np.float32)

    grid = ShardedKNNIndex(pts, mesh)
    assert grid._grid is not None
    d_grid, i_grid = grid.query(q, 8)
    assert grid.last_fallback < q.shape[0] // 2  # grid answered the bulk

    monkeypatch.setattr(ShardedKNNIndex, "GRID_MIN_POINTS", 10 ** 9)
    full = ShardedKNNIndex(pts, mesh)
    assert full._grid is None
    d_full, i_full = full.query(q, 8)

    np.testing.assert_allclose(np.sort(d_grid, 1), np.sort(d_full, 1),
                               rtol=1e-5, atol=1e-6)
    # identical neighbor SETS row-for-row (order can differ only on exact
    # distance ties, which the canonical (d², idx) order also pins — assert
    # full equality and fall back to set equality only if ties exist)
    np.testing.assert_array_equal(np.sort(i_grid, 1), np.sort(i_full, 1))


def test_sharded_knn_predict_matches_sklearn(mesh):
    sklearn = pytest.importorskip("sklearn.neighbors")
    rng = np.random.default_rng(1)
    pts = rng.uniform(size=(3000, 2))
    vals = np.sin(4 * pts[:, 0]) * np.cos(3 * pts[:, 1])
    q = rng.uniform(0.1, 0.9, size=(300, 2))

    sharded = ShardedKNNIndex(pts, mesh, values=vals)
    ours = sharded.predict(q, 8)
    ref = sklearn.KNeighborsRegressor(8, weights="distance").fit(pts, vals).predict(q)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


def test_sharded_interpolate_matches_single(mesh):
    rng = np.random.default_rng(2)
    n_orig, m, k, c, s = 1000, 333, 8, 2, 5
    data = rng.normal(size=(n_orig, c, s)).astype(np.float32)
    idx = rng.integers(0, n_orig, size=(m, k)).astype(np.int32)
    w = rng.uniform(size=(m, k)).astype(np.float32)
    w /= w.sum(1, keepdims=True)

    from sparsespatialsampling_tpu.ops.interpolate import interpolate_data
    ref = interpolate_data(w, idx, data)
    out = sharded_interpolate(w, idx, data, mesh)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_distributed_rsvd_reconstruction(mesh):
    rng = np.random.default_rng(3)
    # low-rank + noise, tall-skinny
    u = rng.normal(size=(4000, 5)).astype(np.float32)
    v = rng.normal(size=(5, 64)).astype(np.float32)
    a = (u * np.asarray([20, 10, 5, 2, 1], dtype=np.float32)) @ v
    a += 1e-4 * rng.normal(size=a.shape).astype(np.float32)

    U, s, V = distributed_rsvd(a, rank=5, mesh=mesh)
    rec = (U * s) @ V.T
    rel = np.linalg.norm(rec - a) / np.linalg.norm(a)
    assert rel < 1e-3, f"rSVD reconstruction rel err {rel}"

    # singular values match the single-device randomized SVD
    _, s_single, _ = randomized_svd(a, rank=5)
    np.testing.assert_allclose(s, s_single, rtol=1e-2)


def test_distributed_rsvd_rank_deficient_no_nan(mesh):
    """A severely rank-deficient sketch (rank-4 signal, width-60 sketch) made
    the float32 Gram matrix numerically indefinite — CholeskyQR silently
    returned NaN. The eigh whitening must stay finite and match the exact
    leading spectrum."""
    rng = np.random.default_rng(20)
    u0 = rng.normal(size=(5000, 4))
    v0 = rng.normal(size=(4, 60))
    a = ((u0 * [40, 15, 6, 2]) @ v0).astype(np.float32)
    a += 1e-3 * rng.normal(size=a.shape).astype(np.float32)

    U, s, V = distributed_rsvd(a, rank=50, mesh=mesh)
    assert np.isfinite(s).all() and np.isfinite(U).all()

    s_exact = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(s[:4], s_exact[:4], rtol=1e-2)


def test_distributed_rsvd_orthogonal_modes(mesh):
    rng = np.random.default_rng(4)
    a = rng.normal(size=(2500, 40)).astype(np.float32)
    U, s, V = distributed_rsvd(a, rank=10, mesh=mesh)
    gram = U.T @ U
    np.testing.assert_allclose(gram, np.eye(10), atol=1e-3)

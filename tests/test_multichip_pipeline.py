"""End-to-end sharded pipeline on the virtual 8-device mesh.

Covers VERDICT round-1 item 2 / SURVEY §5.8: when more than one device is
visible the public pipeline (``SparseSpatialSampling`` → ``ExportData`` →
``write_svd_s_cube_to_file`` / ``compute_svd``) must route its hot paths
through the sharded components (``parallel/``) and produce the SAME grid
(bit-for-bit topology) and fields (to float tolerance) as the single-chip
path.
"""
import os
import tempfile

import numpy as np
import pytest

from sparsespatialsampling_tpu import (
    SparseSpatialSampling, ExportData, CubeGeometry, SphereGeometry,
    Dataloader, compute_svd, write_svd_s_cube_to_file)


@pytest.fixture
def sharded(monkeypatch):
    """Enable pipeline auto-sharding (the conftest disables it suite-wide)."""
    monkeypatch.delenv("S3_TPU_DISABLE_SHARDING", raising=False)


def _cloud(n=4000, d=2, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(size=(n, d))
    metric = np.exp(-np.sum((pts - 0.5) ** 2, axis=1) / 0.02) + 0.01
    return pts, metric


def _run_pipeline(tmp, name, pts, metric, d):
    geo = [CubeGeometry("domain", True, [0.0] * d, [1.0] * d),
           SphereGeometry("hole", False, [0.3] * d, 0.1)]
    s3 = SparseSpatialSampling(pts, metric, geo, save_path=tmp,
                               save_name=name, uniform_levels=3,
                               min_metric=0.85)
    s3.execute_grid_generation()

    times = ["0.1", "0.2", "0.3"]
    snaps = np.stack([metric * (1 + 0.1 * i) for i in range(3)],
                     axis=-1)[:, None, :].astype(np.float32)
    exp = ExportData(s3, write_times=times)
    exp.export(pts, snaps, "p", n_snapshots_total=3)
    dl = Dataloader(tmp, f"{name}.h5")
    return s3, dl.load_snapshot("p"), dl.weights


class TestShardedPipelineEquivalence:
    @pytest.mark.parametrize("d", [2, 3])
    def test_grid_and_fields_match_single_device(self, sharded, monkeypatch, d):
        pts, metric = _cloud(n=3000, d=d)
        with tempfile.TemporaryDirectory() as tmp:
            s3_m, snap_m, w_m = _run_pipeline(tmp, "multi", pts, metric, d)
            assert s3_m._sampling is None  # executed + checkpointed

            monkeypatch.setenv("S3_TPU_DISABLE_SHARDING", "1")
            s3_s, snap_s, w_s = _run_pipeline(tmp, "single", pts, metric, d)

        # topology must match bit-for-bit
        np.testing.assert_array_equal(s3_m.faces, s3_s.faces)
        np.testing.assert_array_equal(s3_m.levels, s3_s.levels)
        np.testing.assert_allclose(s3_m.centers, s3_s.centers)
        np.testing.assert_allclose(s3_m.vertices, s3_s.vertices)
        # interpolated fields to float32 tolerance
        np.testing.assert_allclose(snap_m, snap_s, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(w_m, w_s)

    def test_engine_uses_sharded_index(self, sharded, tmp_path):
        from sparsespatialsampling_tpu.parallel import ShardedKNNIndex
        from sparsespatialsampling_tpu.engine.tree import SamplingTree
        pts, metric = _cloud(n=1500)
        tree = SamplingTree(pts, metric,
                            [CubeGeometry("domain", True, [0, 0], [1, 1])],
                            uniform_level=2, min_metric=0.5)
        assert isinstance(tree._knn, ShardedKNNIndex)
        assert tree._mesh is not None and tree._mesh.devices.size > 1
        tree.refine()
        assert tree.face_ids.shape[0] > 0

    def test_export_uses_sharded_interpolation(self, sharded, tmp_path):
        pts, metric = _cloud(n=1200)
        geo = [CubeGeometry("domain", True, [0, 0], [1, 1])]
        s3 = SparseSpatialSampling(pts, metric, geo, save_path=str(tmp_path),
                                   save_name="e", uniform_levels=3,
                                   min_metric=0.7)
        s3.execute_grid_generation()
        exp = ExportData(s3, write_times=["0.1"])
        exp.export(pts, metric[:, None, None].astype(np.float32), "p",
                   n_snapshots_total=1)
        from sparsespatialsampling_tpu.parallel import ShardedKNNIndex
        assert isinstance(exp._knn, ShardedKNNIndex)
        assert exp._mesh is not None

    def test_compute_svd_routes_distributed(self, sharded, monkeypatch):
        """Above the row threshold compute_svd must run the distributed rSVD
        and match the single-device randomized path to tolerance."""
        import sparsespatialsampling_tpu.utils as utils
        monkeypatch.setattr(utils, "_RSVD_ROW_THRESHOLD", 500)
        rng = np.random.default_rng(1)
        base = rng.normal(size=(800, 4)) @ rng.normal(size=(4, 24))
        data = (base + 0.001 * rng.normal(size=(800, 24))).astype(np.float32)
        area = rng.uniform(0.5, 2.0, size=800).astype(np.float32)

        s_m, u_m, v_m = utils.compute_svd(data, area, rank=4)

        monkeypatch.setenv("S3_TPU_DISABLE_SHARDING", "1")
        s_s, u_s, v_s = utils.compute_svd(data, area, rank=4)

        np.testing.assert_allclose(s_m, s_s, rtol=1e-3)
        # modes up to sign
        for i in range(4):
            dot = np.dot(u_m[:, i], u_s[:, i])
            np.testing.assert_allclose(abs(dot),
                                       np.linalg.norm(u_m[:, i])
                                       * np.linalg.norm(u_s[:, i]),
                                       rtol=1e-3)

    def test_write_svd_sharded_end_to_end(self, sharded, monkeypatch, tmp_path):
        import sparsespatialsampling_tpu.utils as utils
        monkeypatch.setattr(utils, "_RSVD_ROW_THRESHOLD", 100)
        pts, metric = _cloud(n=2000)
        _run_pipeline(str(tmp_path), "w", pts, metric, 2)
        write_svd_s_cube_to_file("p", str(tmp_path), "w", new_file=False,
                                 rank=3, n_modes=2)
        assert os.path.isfile(os.path.join(str(tmp_path), "w_p_svd.h5"))

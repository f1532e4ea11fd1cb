"""Device-resident adaptive loop vs the per-iteration host loop.

The device loop (``engine/tree.py::_device_adaptive_call``) moves ramp,
top-k selection, split, fused epoch and captured-metric stopping into one
``lax.while_loop``; these tests pin that both paths grow IDENTICAL trees —
same cells, levels, iteration counts and captured-metric series — in both
stopping modes, including re-entry when the iteration count exceeds one
device call's budget and the exact-fallback exit near point-cloud holes.
"""
import os
import tempfile

import numpy as np
import pytest

from sparsespatialsampling_tpu.ops.knn import KNNIndex
from sparsespatialsampling_tpu import (SparseSpatialSampling, CubeGeometry,
                                       SphereGeometry)


def _run(monkeypatch, device_loop: bool, **kwargs):
    monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
    monkeypatch.setenv("S3_TPU_DEVICE_LOOP", "1" if device_loop else "0")
    rng = np.random.default_rng(0)
    xy = rng.uniform([0, 0], [1, 1], size=(9000, 2))
    r = np.linalg.norm(xy - [0.3, 0.5], axis=1)
    xy = xy[r > 0.05][:8000]
    metric = np.exp(-((xy[:, 0] - .6) ** 2 + (xy[:, 1] - .5) ** 2) / .05) + 0.01
    tmp = tempfile.mkdtemp()
    s3 = SparseSpatialSampling(
        xy, metric,
        [CubeGeometry("domain", True, [0, 0], [1, 1]),
         SphereGeometry("hole", False, [0.3, 0.5], 0.05)],
        save_path=tmp, save_name="d", uniform_levels=3, **kwargs)
    s3.execute_grid_generation()
    return s3


def _grid_key(s3):
    c = np.asarray(s3.centers)
    lv = np.asarray(s3.levels).ravel()
    order = np.lexsort((lv,) + tuple(c.T))
    return c[order], lv[order]


@pytest.mark.parametrize("kwargs", [
    {"n_cells_max": 2000},
    {"min_metric": 0.9},
], ids=["cells-mode", "metric-mode"])
def test_device_loop_matches_host_loop(monkeypatch, kwargs):
    a = _run(monkeypatch, device_loop=False, **kwargs)
    b = _run(monkeypatch, device_loop=True, **kwargs)
    ca, la = _grid_key(a)
    cb, lb = _grid_key(b)
    assert ca.shape == cb.shape
    np.testing.assert_allclose(ca, cb)
    np.testing.assert_array_equal(la, lb)
    assert (a.data_final_mesh["iterations"]
            == b.data_final_mesh["iterations"])
    np.testing.assert_allclose(a.data_final_mesh["metric_per_iter"],
                               b.data_final_mesh["metric_per_iter"],
                               rtol=1e-5)


def test_device_loop_engaged(monkeypatch):
    """The eligible configuration must actually run iterations on device
    (one main call batching many iterations), not fall back silently."""
    b = _run(monkeypatch, device_loop=True, n_cells_max=2000)
    stats = b.data_final_mesh["epoch_stats"]
    iters = b.data_final_mesh["adaptive_split"]["n_iter"]
    # far fewer device calls than iterations == the loop is batching
    assert iters > 5
    assert stats["n_calls_main"] < iters

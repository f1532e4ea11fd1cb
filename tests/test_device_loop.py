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
    {"n_cells_max": 2000, "max_delta_level": True},
    {"min_metric": 0.9, "max_delta_level": True},
], ids=["cells-mode", "metric-mode", "cells-mode-2to1", "metric-mode-2to1"])
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


def test_geometry_mdl_loop_matches_host(monkeypatch):
    """The geometry device loop's in-program 2:1 closure
    (S3_TPU_GEO_MDL_LOOP=1; off by default on a measured warm tradeoff)
    must grow the identical grid as the host per-level walk — including
    the at-target-seed semantics (an at-target surface cell refines only
    when a probe re-found it as someone's coarser neighbor)."""
    def run(geo_loop: bool):
        monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
        monkeypatch.setenv("S3_TPU_DEVICE_LOOP", "1")
        monkeypatch.setenv("S3_TPU_GEO_MDL_LOOP", "1" if geo_loop else "0")
        rng = np.random.default_rng(0)
        xy = rng.uniform([0, 0], [1, 1], size=(9000, 2))
        r = np.linalg.norm(xy - [0.3, 0.5], axis=1)
        xy = xy[r > 0.05][:8000]
        metric = np.exp(-((xy[:, 0] - .6) ** 2
                          + (xy[:, 1] - .5) ** 2) / .05) + 0.01
        tmp = tempfile.mkdtemp()
        s3 = SparseSpatialSampling(
            xy, metric,
            [CubeGeometry("domain", True, [0, 0], [1, 1]),
             SphereGeometry("hole", False, [0.3, 0.5], 0.05, refine=True,
                            min_refinement_level=6)],
            save_path=tmp, save_name="gmdl", uniform_levels=3,
            n_cells_max=1500, max_delta_level=True)
        s3.execute_grid_generation()
        return s3

    a = run(geo_loop=False)
    b = run(geo_loop=True)
    ca, la = _grid_key(a)
    cb, lb = _grid_key(b)
    assert ca.shape == cb.shape
    np.testing.assert_allclose(ca, cb)
    np.testing.assert_array_equal(la, lb)


def test_device_loop_sort_selection_branch(monkeypatch):
    """Large per-iteration budgets (k_max > 2048) route the in-loop gain
    selection through the stable-sort branch instead of lax.top_k (a
    large-k top_k crashed the TPU worker at scale); the selection must be
    bitwise-identical — same grid, iterations, metric series."""
    kwargs = {"n_cells_max": 6000, "n_cells_iter_start": 2500}
    a = _run(monkeypatch, device_loop=False, **kwargs)
    b = _run(monkeypatch, device_loop=True, **kwargs)
    ca, la = _grid_key(a)
    cb, lb = _grid_key(b)
    assert ca.shape == cb.shape
    np.testing.assert_allclose(ca, cb)
    np.testing.assert_array_equal(la, lb)
    # the loop must actually have engaged with the big budget
    stats = b.data_final_mesh["epoch_stats"]
    assert stats["n_calls_main"] <= b.data_final_mesh["iterations"]


@pytest.mark.parametrize("kwargs", [
    {"n_cells_max": 2000},
    {"n_cells_max": 2000, "max_delta_level": True},
], ids=["plain", "2to1"])
def test_device_loop_engaged(monkeypatch, kwargs):
    """The eligible configuration must actually run iterations on device
    (one main call batching many iterations), not fall back silently —
    including with the 2:1 constraint, whose expansion runs in-program."""
    b = _run(monkeypatch, device_loop=True, **kwargs)
    stats = b.data_final_mesh["epoch_stats"]
    iters = b.data_final_mesh["adaptive_split"]["n_iter"]
    # far fewer device calls than iterations == the loop is batching
    assert iters > 5
    assert stats["n_calls_main"] < iters


def _run_gridless(monkeypatch, device_loop: bool, **kwargs):
    """Small cloud BELOW GRID_MIN_POINTS: no bucket grid is built, so the
    device loop must engage through the exact full-scan core."""
    monkeypatch.setenv("S3_TPU_DEVICE_LOOP", "1" if device_loop else "0")
    rng = np.random.default_rng(7)
    xy = rng.uniform([0, 0], [1, 1], size=(5000, 2))
    metric = np.exp(-((xy[:, 0] - .4) ** 2
                      + (xy[:, 1] - .6) ** 2) / .03) + 0.02
    tmp = tempfile.mkdtemp()
    s3 = SparseSpatialSampling(
        xy, metric, [CubeGeometry("domain", True, [0, 0], [1, 1])],
        save_path=tmp, save_name="g", uniform_levels=3, **kwargs)
    s3.execute_grid_generation()
    return s3


@pytest.mark.parametrize("kwargs", [
    {"n_cells_max": 1200},
    {"min_metric": 0.9},
    {"min_metric": 0.9, "max_delta_level": True},
], ids=["cells-mode", "metric-mode", "metric-mode-2to1"])
def test_device_loop_fullscan_core_matches_host(monkeypatch, kwargs):
    """Gridless (sub-GRID_MIN_POINTS) clouds run the loop with the
    full-scan epoch core; the grids must be identical to the host path.
    Regression: metric-mode runs on reference-tutorial-1-scale clouds
    paid one tunnel round trip per adaptive iteration."""
    a = _run_gridless(monkeypatch, device_loop=False, **kwargs)
    b = _run_gridless(monkeypatch, device_loop=True, **kwargs)
    ca, la = _grid_key(a)
    cb, lb = _grid_key(b)
    assert ca.shape == cb.shape
    np.testing.assert_allclose(ca, cb)
    np.testing.assert_array_equal(la, lb)
    assert (a.data_final_mesh["iterations"]
            == b.data_final_mesh["iterations"])
    stats = b.data_final_mesh["epoch_stats"]
    iters = b.data_final_mesh["adaptive_split"]["n_iter"]
    assert iters > 3 and stats["n_calls_main"] < iters


@pytest.mark.parametrize("mdl", [False, True], ids=["plain", "2to1"])
def test_geometry_loop_matches_host_levels(monkeypatch, mdl):
    """The device-resident geometry-refinement loop (one dispatch for up
    to 8 levels) must grow the same grid as the per-level host path —
    with a deep min_refinement_level so several levels run, with and
    without the 2:1 constraint."""
    def run(device_loop):
        monkeypatch.setenv("S3_TPU_DEVICE_LOOP",
                           "1" if device_loop else "0")
        rng = np.random.default_rng(11)
        xy = rng.uniform([0, 0], [1, 1], size=(9000, 2))
        r = np.linalg.norm(xy - [0.3, 0.5], axis=1)
        xy = xy[r > 0.05][:8000]
        metric = np.exp(-((xy[:, 0] - .6) ** 2
                          + (xy[:, 1] - .5) ** 2) / .05) + 0.01
        tmp = tempfile.mkdtemp()
        s3 = SparseSpatialSampling(
            xy, metric,
            [CubeGeometry("domain", True, [0, 0], [1, 1]),
             SphereGeometry("hole", False, [0.3, 0.5], 0.05,
                            refine=True, min_refinement_level=9)],
            save_path=tmp, save_name="g", uniform_levels=3,
            n_cells_max=1500, max_delta_level=mdl)
        s3.execute_grid_generation()
        return s3

    a = run(False)
    b = run(True)
    ca, la = _grid_key(a)
    cb, lb = _grid_key(b)
    assert ca.shape == cb.shape
    np.testing.assert_allclose(ca, cb)
    np.testing.assert_array_equal(la, lb)
    assert int(la.max()) == 9  # the deep geometry target was reached


@pytest.mark.parametrize("mode", ["auto", "1", "0"],
                         ids=["auto", "always", "never"])
def test_full_rescue_modes_identical_grid(monkeypatch, mode):
    """S3_TPU_FULL_RESCUE only changes WHERE bad cells are resolved
    (in-kernel vs host escalation), never the grid: all three modes must
    produce the same cells on a hole-heavy workload, and 'auto' must
    actually flip the engine to rescue-active when bad cells appear."""
    from sparsespatialsampling_tpu.engine.tree import SamplingTree

    monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
    monkeypatch.setenv("S3_TPU_FULL_RESCUE", mode)
    rng = np.random.default_rng(0)
    xy = rng.uniform([0, 0], [1, 1], size=(9000, 2))
    r = np.linalg.norm(xy - [0.3, 0.5], axis=1)
    xy = xy[r > 0.12][:7000]   # big hole → ring margins fail near it
    metric = np.exp(-np.maximum(r[r > 0.12][:7000] - 0.12, 0) / 0.05) + 0.01
    tree = SamplingTree(xy, metric,
                        [CubeGeometry("domain", True, [0, 0], [1, 1]),
                         SphereGeometry("hole", False, [0.3, 0.5], 0.12)],
                        uniform_level=3, n_cells=1500)
    tree.refine()
    if mode == "auto" and tree._epoch_stats["n_bad_cells"] > 0:
        assert tree._rescue_active   # the sticky switch engaged
    key = np.lexsort((tree.all_levels.ravel(),) + tuple(
        np.asarray(tree.all_centers).T))
    result = (np.asarray(tree.all_centers)[key],
              np.asarray(tree.all_levels).ravel()[key])
    cache = test_full_rescue_modes_identical_grid.__dict__
    if "ref" in cache:
        np.testing.assert_allclose(result[0], cache["ref"][0])
        np.testing.assert_array_equal(result[1], cache["ref"][1])
    else:
        cache["ref"] = result


def test_geometry_loop_pre_select_polygon(monkeypatch):
    """With pre_select_cells=True and an expensive (coordinates-2D)
    geometry, the epoch kernels run the host bbox-gated route but the
    geometry-refinement device loop still engages (the bbox gate is a
    conservative filter, so the full in-loop predicate gives identical
    flags) — the OAT bench configuration."""
    from sparsespatialsampling_tpu import GeometryCoordinates2D
    t = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    poly = np.stack([0.4 + 0.12 * np.cos(t), 0.5 + 0.07 * np.sin(t)], 1)

    def run(device_loop):
        monkeypatch.setenv("S3_TPU_DEVICE_LOOP",
                           "1" if device_loop else "0")
        rng = np.random.default_rng(13)
        xy = rng.uniform([0, 0], [1, 1], size=(8000, 2))
        metric = np.exp(-((xy[:, 0] - .7) ** 2
                          + (xy[:, 1] - .5) ** 2) / .05) + 0.01
        tmp = tempfile.mkdtemp()
        s3 = SparseSpatialSampling(
            xy, metric,
            [CubeGeometry("domain", True, [0, 0], [1, 1]),
             GeometryCoordinates2D("wing", False, poly, refine=True,
                                   min_refinement_level=8)],
            save_path=tmp, save_name="w", uniform_levels=3,
            n_cells_max=1500, pre_select_cells=True)
        s3.execute_grid_generation()
        return s3

    a = run(False)
    b = run(True)
    ca, la = _grid_key(a)
    cb, lb = _grid_key(b)
    assert ca.shape == cb.shape
    np.testing.assert_allclose(ca, cb)
    np.testing.assert_array_equal(la, lb)
    assert int(la.max()) == 8


def test_device_loop_3d_stl_obstacle(monkeypatch, tmp_path):
    """3D device loop with an STL obstacle: the fused epoch inside the
    lax.while_loop evaluates the sign-grid winding test, and cells whose
    kNN fails near the obstacle's point-cloud hole exit to the host
    escalation. The device path must match the host path exactly."""
    import sys
    from os.path import dirname
    sys.path.insert(0, dirname(dirname(__file__)))
    from bench import synthetic_sphere_stl
    from sparsespatialsampling_tpu import GeometrySTL3D

    monkeypatch.setattr(KNNIndex, "GRID_MIN_POINTS", 1000)
    stl = str(tmp_path / "sphere.stl")
    synthetic_sphere_stl(stl, n_lat=16, n_lon=12)

    def run(device_loop):
        monkeypatch.setenv("S3_TPU_DEVICE_LOOP",
                           "1" if device_loop else "0")
        rng = np.random.default_rng(3)
        xyz = rng.uniform([0, 0, 0], [0.6, 0.4, 0.4], size=(7000, 3))
        rr = np.linalg.norm(xyz - [0.2, 0.2, 0.2], axis=1)
        xyz = xyz[rr > 0.05][:6000]
        metric = np.exp(-np.maximum(np.linalg.norm(
            xyz - [0.2, 0.2, 0.2], axis=1) - 0.05, 0) / 0.1) + 0.01
        s3 = SparseSpatialSampling(
            xyz, metric,
            [CubeGeometry("domain", True, [0, 0, 0], [0.6, 0.4, 0.4]),
             GeometrySTL3D("sphere", False, stl)],
            save_path=str(tmp_path), save_name="s", uniform_levels=2,
            n_cells_max=1500)
        s3.execute_grid_generation()
        return s3

    a = run(False)
    b = run(True)
    ca, la = _grid_key(a)
    cb, lb = _grid_key(b)
    assert ca.shape == cb.shape
    np.testing.assert_allclose(ca, cb)
    np.testing.assert_array_equal(la, lb)

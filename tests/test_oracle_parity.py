"""Parity of the TPU engine against an independent pure-numpy oracle.

``tests/oracle.py`` re-implements the reference algorithm from its
specification (brute-force exact k-NN, per-cell objects, heap selection,
the published gain/ramp/stopping formulas — reference ``s_cube.py``
semantics throughout) with none of the engine's machinery.  These tests
assert that on small clouds both implementations grow IDENTICAL grids —
same (level, lattice-coordinate) cell sets — and agree on the captured
metric trace to f32-vs-f64 tolerance.  This is the strongest available
answer to "does the engine match the reference?" given that the reference
itself cannot run here (numba/flowtorch absent).
"""
import tempfile

import numpy as np
import pytest

from sparsespatialsampling_tpu import (SparseSpatialSampling, CubeGeometry,
                                       SphereGeometry)
from tests.oracle import (OracleS3, OracleGeometry, cube_inside,
                          sphere_inside)


def _cloud_2d(n=1500, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform([0, 0], [1, 1], size=(n, 2))
    metric = (np.exp(-((xy[:, 0] - .6) ** 2 + (xy[:, 1] - .45) ** 2) / .03)
              + 0.02)
    return xy, metric


def _cloud_3d(n=1200, seed=1):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform([0, 0, 0], [1, 1, 1], size=(n, 3))
    metric = (np.exp(-((xyz[:, 0] - .5) ** 2 + (xyz[:, 1] - .5) ** 2
                       + (xyz[:, 2] - .4) ** 2) / .05) + 0.02)
    return xyz, metric


def _engine_keys(s3, width, lo):
    levels = np.asarray(s3.levels).ravel()
    centers = np.asarray(s3.centers)
    size = width / (2.0 ** levels)
    ij = np.rint((centers - np.asarray(lo)) / size[:, None] - 0.5)
    return {(int(l), *map(int, row)) for l, row in zip(levels, ij)}


def _run_both(points, metric, obstacle=None, **kwargs):
    d = points.shape[1]
    lo, hi = [0.0] * d, [1.0] * d
    geoms = [CubeGeometry("domain", True, lo, hi)]
    o_geoms = [OracleGeometry("domain", True, cube_inside(lo, hi),
                              main_width=1.0,
                              center=np.full(d, 0.5))]
    if obstacle is not None:
        center, radius, refine, min_level = obstacle
        geoms.append(SphereGeometry("hole", False, center, radius,
                                    refine=refine,
                                    min_refinement_level=min_level))
        o_geoms.append(OracleGeometry("hole", False,
                                      sphere_inside(center, radius),
                                      refine=refine,
                                      min_refinement_level=min_level))

    tmp = tempfile.mkdtemp()
    s3 = SparseSpatialSampling(points, metric, geoms, save_path=tmp,
                               save_name="o", **kwargs)
    s3.execute_grid_generation()

    okwargs = {{"n_cells_max": "n_cells_max",
                "uniform_levels": "uniform_levels",
                "min_metric": "min_metric",
                "max_delta_level": "max_delta_level",
                "n_cells_iter_start": "n_cells_iter_start"}[k]: v
               for k, v in kwargs.items()}
    oracle = OracleS3(points, metric, o_geoms, **okwargs).refine()
    return s3, oracle


def _assert_identical(s3, oracle):
    ek = _engine_keys(s3, oracle.width,
                      np.asarray(oracle.geometries[0].center) - 0.5)
    ok = oracle.lattice_keys()
    assert len(ek) == len(ok), (len(ek), len(ok))
    assert ek == ok
    np.testing.assert_allclose(
        np.asarray(s3.data_final_mesh["metric_per_iter"], dtype=float),
        np.asarray(oracle.metric_trace), atol=3e-5)


def test_oracle_parity_2d_metric_mode():
    xy, metric = _cloud_2d()
    s3, oracle = _run_both(xy, metric, uniform_levels=2, min_metric=0.9,
                           n_cells_iter_start=10)
    _assert_identical(s3, oracle)


def test_oracle_parity_2d_cells_mode_geometry_refinement():
    xy, metric = _cloud_2d(seed=2)
    s3, oracle = _run_both(xy, metric,
                           obstacle=([0.35, 0.5], 0.08, True, 5),
                           uniform_levels=2, n_cells_max=400,
                           n_cells_iter_start=12)
    _assert_identical(s3, oracle)


def test_oracle_parity_2d_max_delta_level():
    xy, metric = _cloud_2d(seed=3)
    s3, oracle = _run_both(xy, metric,
                           obstacle=([0.35, 0.5], 0.08, True, 5),
                           uniform_levels=2, min_metric=0.85,
                           max_delta_level=True, n_cells_iter_start=10)
    _assert_identical(s3, oracle)


def test_oracle_parity_2d_cells_mode_max_delta_level():
    xy, metric = _cloud_2d(seed=5)
    s3, oracle = _run_both(xy, metric,
                           obstacle=([0.35, 0.5], 0.08, True, 5),
                           uniform_levels=2, n_cells_max=500,
                           max_delta_level=True, n_cells_iter_start=12)
    _assert_identical(s3, oracle)


def test_oracle_parity_3d_metric_mode():
    xyz, metric = _cloud_3d()
    s3, oracle = _run_both(xyz, metric,
                           obstacle=([0.3, 0.3, 0.3], 0.1, False, None),
                           uniform_levels=1, min_metric=0.8,
                           n_cells_iter_start=8)
    _assert_identical(s3, oracle)


def test_oracle_parity_3d_max_delta_level_geometry():
    xyz, metric = _cloud_3d(seed=9)
    s3, oracle = _run_both(xyz, metric,
                           obstacle=([0.3, 0.3, 0.3], 0.1, True, 3),
                           uniform_levels=1, n_cells_max=300,
                           max_delta_level=True, n_cells_iter_start=8)
    _assert_identical(s3, oracle)

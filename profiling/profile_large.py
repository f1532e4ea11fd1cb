"""Diagnose the 2M-point workload: kNN build phase split + retry ledger.

Round-4 verdict: the one at-scale artifact showed t_total 135.7 s with an
11,910-bad-cell retry storm (50 ring + 2 full-scan host calls) and a 24.9 s
host k-NN build.  This script splits the build (morton / plan / upload /
device assembly) and prints the full per-run ledger so the storm can be
attributed before optimizing.

Run: python profiling/profile_large.py [n_points] [n_runs]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_points = int(float(sys.argv[1])) if len(sys.argv) > 1 else 2_000_000
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpi = int(sys.argv[3]) if len(sys.argv) > 3 else max(1000, n_points // 200)

    rng = np.random.default_rng(0)
    xyz = rng.uniform([0, 0, 0], [4, 1, 1], size=(n_points, 3)).astype(np.float32)
    metric = (np.exp(-np.maximum(xyz[:, 0] - 0.5, 0))
              * np.exp(-((xyz[:, 1] - 0.5) ** 2 + (xyz[:, 2] - 0.5) ** 2) / 0.1)
              + 0.01).astype(np.float64)

    import jax
    import jax.numpy as jnp
    from sparsespatialsampling_tpu.ops import knn as knn_mod
    from sparsespatialsampling_tpu.ops.knn import KNNIndex, _plan_grid

    # warm the channel
    t0 = time.perf_counter()
    float(jnp.ones((8, 8)).sum())
    print(f"warmup: {time.perf_counter() - t0:.2f}s", flush=True)

    # ---- kNN build phase split -----------------------------------------
    from sparsespatialsampling_tpu.ops import morton
    centered = xyz - xyz.mean(axis=0)
    t0 = time.perf_counter()
    lo = centered.min(axis=0)
    extent = np.maximum(centered.max(axis=0) - lo, 1e-30)
    depth = morton.MAX_DEPTH[3]
    grid01 = np.clip(((centered - lo) / extent * ((1 << depth) - 1))
                     .astype(np.uint64), 0, (1 << depth) - 1)
    codes = morton.encode(grid01)
    t_codes = time.perf_counter() - t0
    t0 = time.perf_counter()
    perm = np.argsort(codes, kind="stable")
    t_sort = time.perf_counter() - t0
    sorted_pts = centered[perm]
    t0 = time.perf_counter()
    plan = _plan_grid(sorted_pts.astype(np.float32), n_points, n_points,
                      KNNIndex.GRID_OCCUPANCY, KNNIndex.GRID_CAPACITY,
                      host_arrays=False,
                      shrink_target=KNNIndex.GRID_SHRINK_TARGET)
    t_plan = time.perf_counter() - t0
    print(f"build split: morton={t_codes:.2f}s argsort={t_sort:.2f}s "
          f"plan={t_plan:.2f}s  (C={plan['C']} n_cells={plan['n_cells']})",
          flush=True)

    t0 = time.perf_counter()
    knn = KNNIndex(xyz, values=metric)
    # force materialization of the device arrays
    g = knn._grid
    if g is not None:
        sync = g.get("dil_pts", g["cell_pts"])
        float(jax.device_get(sync.ravel()[0]))
    t_full_build = time.perf_counter() - t0
    print(f"KNNIndex full build (incl. upload+device assemble): "
          f"{t_full_build:.2f}s  dilated={'dil_pts' in (g or {})}",
          flush=True)
    del knn

    # ---- full refine with retry ledger ---------------------------------
    import tempfile
    from sparsespatialsampling_tpu import SparseSpatialSampling, CubeGeometry
    tmp = tempfile.mkdtemp()
    for run in range(n_runs):
        t0 = time.perf_counter()
        s3 = SparseSpatialSampling(
            xyz, metric, [CubeGeometry("domain", True, [0, 0, 0], [4, 1, 1])],
            save_path=tmp, save_name="large",
            uniform_levels=4, n_cells_max=200_000,
            n_cells_iter_start=cpi)
        s3.execute_grid_generation()
        t_refine = time.perf_counter() - t0
        dfm = s3.data_final_mesh
        out = {"run": run, "t_refine": round(t_refine, 2),
               "n_cells": int(s3.faces.shape[0]),
               "cells_per_s": round(s3.faces.shape[0] / t_refine, 1)}
        for k in ("t_init", "t_knn_build", "t_uniform", "t_adaptive",
                  "t_geometry", "t_renumbering", "t_finalize",
                  "t_checkpoint"):
            v = dfm.get(k)
            out[k] = round(v, 2) if v else v
        es = dfm.get("epoch_stats") or {}
        for k in ("queries", "n_calls_main", "n_calls_ring", "n_calls_full",
                  "n_bad_cells", "t_retry_s", "t_dispatch_s",
                  "t_readback_s", "wall_s"):
            if k in es:
                out[k] = round(es[k], 2) if isinstance(es[k], float) else es[k]
        for k, v in (dfm.get("adaptive_split") or {}).items():
            out[f"adaptive_{k}"] = v
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

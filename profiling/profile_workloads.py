"""Quick per-workload TPU measurement: run selected bench workloads N times
and print their refine ledgers (retry counts, dispatch/readback splits).

Run: python profiling/profile_workloads.py mdl c2d stl [n_runs]
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ledger(name, run, s3, t):
    dfm = s3.data_final_mesh
    out = {"workload": name, "run": run, "t_refine": round(t, 3),
           "n_cells": int(s3.faces.shape[0]),
           "iters": int(dfm.get("iterations", -1)),
           "captured": round(float(dfm["metric_per_iter"][-1]), 4)
           if dfm.get("metric_per_iter") else None}
    for k in ("t_init", "t_knn_build", "t_uniform", "t_adaptive",
              "t_geometry", "t_renumbering", "t_checkpoint"):
        v = dfm.get(k)
        out[k] = round(v, 3) if v else v
    es = dfm.get("epoch_stats") or {}
    for k in ("n_calls_main", "n_calls_ring", "n_calls_full", "n_bad_cells",
              "t_retry_s", "t_dispatch_s", "t_readback_s"):
        if k in es:
            out[k] = round(es[k], 3) if isinstance(es[k], float) else es[k]
    print(json.dumps(out), flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.isdigit()]
    n_runs = int([a for a in sys.argv[1:] if a.isdigit()][0]) \
        if any(a.isdigit() for a in sys.argv[1:]) else 2
    import jax.numpy as jnp
    t0 = time.perf_counter()
    float(jnp.ones((8, 8)).sum())
    print(f"warmup: {time.perf_counter() - t0:.2f}s", flush=True)

    import bench
    tmp = tempfile.mkdtemp()
    for name in args or ["mdl"]:
        for run in range(n_runs):
            t0 = time.perf_counter()
            if name == "mdl":
                s3, t = bench.run_cylinder2d_metric(tmp, max_delta_level=True)
            elif name == "c2d":
                s3, t = bench.run_cylinder2d_metric(tmp)
            elif name == "stl":
                s3, _, t = bench.run_stl(tmp)
            elif name == "oat":
                xy, metric, poly = bench.synthetic_oat15()
                s3, _, t = bench.run_refine_oat(xy, metric, poly, tmp, "oat")
            elif name == "c3d":
                out = bench.run_cylinder3d(tmp)
                s3, t = out[0], out[1]
            else:
                raise SystemExit(f"unknown workload {name}")
            ledger(name, run, s3, t)


if __name__ == "__main__":
    main()

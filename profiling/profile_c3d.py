"""One instrumented cylinder3D north-star run (TPU). Not part of bench.py —
a dev tool for attributing wall time to sub-phases."""
import json
import tempfile
import time

import numpy as np

from bench import synthetic_cylinder3d


def main():
    from sparsespatialsampling_tpu import (
        SparseSpatialSampling, ExportData, CubeGeometry, CylinderGeometry3D,
        write_svd_s_cube_to_file)
    # absorb the tunnel's first-readback channel-init stall (0.03..340 s,
    # environmental) so it doesn't land in a phase bucket
    import jax, jax.numpy as jnp
    tw = time.perf_counter()
    np.asarray(jnp.zeros((8,)) + 1.0)
    t_channel_init = time.perf_counter() - tw
    tmp = tempfile.mkdtemp()
    xyz, metric, bounds = synthetic_cylinder3d()
    geometries = [
        CubeGeometry("domain", True, bounds[0], bounds[1]),
        CylinderGeometry3D("cylinder", False,
                           [[0.2, 0.2, 0.0], [0.2, 0.2, 0.41]], 0.05,
                           refine=True, min_refinement_level=7),
    ]
    t0 = time.perf_counter()
    s3 = SparseSpatialSampling(
        xyz, metric, geometries, save_path=tmp, save_name="c3d",
        uniform_levels=5, n_cells_max=150_000)
    t_ctor = time.perf_counter() - t0
    s3.execute_grid_generation()
    t_refine = time.perf_counter() - t0

    dfm = s3.data_final_mesh
    n_snap = 50
    phases = np.linspace(0, 2 * np.pi, n_snap, endpoint=False)
    snaps = (metric[:, None]
             * (1 + 0.2 * np.sin(phases)[None, :])).astype(np.float32)
    times = [f"{t:.4f}" for t in np.arange(n_snap) * 5e-4]

    t1 = time.perf_counter()
    exp = ExportData(s3, write_times=times)
    exp.export(xyz, snaps[:, None, :], "k", n_snapshots_total=n_snap)
    t_interp = time.perf_counter() - t1

    t2 = time.perf_counter()
    write_svd_s_cube_to_file("k", tmp, "c3d", new_file=False, rank=20,
                             n_modes=5)
    t_svd = time.perf_counter() - t2

    out = {
        "t_channel_init": round(t_channel_init, 3),
        "t_ctor": round(t_ctor, 3),
        "t_refine": round(t_refine, 3),
        "t_interp": round(t_interp, 3),
        "t_svd": round(t_svd, 3),
        "n_cells": int(s3.faces.shape[0]),
        "phases": {k: round(v, 3) for k, v in dfm.items()
                   if k.startswith("t_") and isinstance(v, (int, float))},
        "export_timings": {k: (round(v, 3) if isinstance(v, float) else v)
                           for k, v in exp.timings.items()},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

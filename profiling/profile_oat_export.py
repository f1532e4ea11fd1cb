"""Profile the OAT export weight-cache build in isolation.

Runs the bench's OAT refine once, then exports TWICE with fresh
ExportData objects: run 1 includes any fresh kernel compiles/program
loads, run 2 is steady state.  Splits t_weights / t_kernel / t_h5.
"""
import tempfile
import time

import numpy as np

from bench import synthetic_oat15, run_refine_oat


def main():
    xy, metric, poly = synthetic_oat15()
    tmp = tempfile.mkdtemp()
    s3, t_init, t_refine = run_refine_oat(xy, metric, poly, tmp, "prof")
    print(f"refine: {t_refine:.3f} s ({s3.faces.shape[0]} cells)")

    from sparsespatialsampling_tpu import ExportData
    n_snap = 50
    phases = np.linspace(0, 2 * np.pi, n_snap, endpoint=False)
    snaps = (metric[:, None]
             * (1 + 0.2 * np.sin(phases)[None, :])).astype(np.float32)
    times = [f"{t:.4f}" for t in np.arange(n_snap) * 5e-4]

    for run in (1, 2):
        t0 = time.perf_counter()
        exp = ExportData(s3, write_times=times)
        exp.export(xy, snaps[:, None, :], "Ma", n_snapshots_total=n_snap)
        wall = time.perf_counter() - t0
        print(f"export run {run}: {wall:.3f} s  timings="
              + " ".join(f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
                         for k, v in exp.timings.items()))


if __name__ == "__main__":
    main()

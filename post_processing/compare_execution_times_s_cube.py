"""Plot S³ execution-time breakdowns and grid quality across runs.

Analog of the reference ``post_processing/compare_execution_times_s_cube.py``:
loads the ``mesh_info_{name}.pt`` dicts written by
``SparseSpatialSampling.execute_grid_generation()`` and plots the phase
timings (uniform / adaptive / geometry / renumbering), final cell counts,
and captured metric per run.

Usage:
    python3 compare_execution_times_s_cube.py <dir> [<dir2> ...]
It picks up every ``mesh_info_*.pt`` in the given directories.
"""
import sys
from glob import glob
from os.path import join, basename

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from sparsespatialsampling_tpu.sparse_spatial_sampling import load_s_cube


def load_mesh_infos(directories):
    runs = {}
    for d in directories:
        for f in sorted(glob(join(d, "mesh_info_*.pt"))):
            name = basename(f)[len("mesh_info_"):-len(".pt")]
            runs[name] = load_s_cube(f)
    return runs


def plot_timings(runs, out="execution_times.png"):
    names = list(runs)
    phases = ["t_uniform", "t_adaptive", "t_geometry", "t_renumbering"]
    labels = ["uniform", "adaptive", "geometry", "renumbering"]

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5))
    bottom = np.zeros(len(names))
    for phase, label in zip(phases, labels):
        vals = np.asarray([runs[n].get(phase) or 0.0 for n in names])
        ax1.bar(names, vals, bottom=bottom, label=label)
        bottom += vals
    ax1.set_ylabel("wall time [s]")
    ax1.set_title("execution time per phase")
    ax1.legend()
    ax1.tick_params(axis="x", rotation=45)

    for n in names:
        info = runs[n]
        metric = info.get("metric_per_iter", [])
        cells = info.get("cells_per_iter", [])
        if metric and cells:
            ax2.plot(cells[-len(metric):], np.asarray(metric) * 100, "-o",
                     markersize=3, label=n)
    ax2.set_xlabel(r"$N_{cells}$")
    ax2.set_ylabel("captured metric [%]")
    ax2.set_title("metric convergence")
    ax2.legend()

    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["."]
    runs = load_mesh_infos(dirs)
    if not runs:
        sys.exit(f"no mesh_info_*.pt files found in {dirs}")
    for name, info in runs.items():
        print(f"{name}: {info['n_cells']} cells, levels "
              f"{info['min_level']}-{info['max_level']}, "
              f"total {info['t_total']:.2f}s")
    plot_timings(runs)

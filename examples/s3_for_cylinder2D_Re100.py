"""Cylinder-2D (Re=100) workload — TPU-native S³.

Mirror of the reference example ``examples/s3_for_cylinder2D_Re100.py``:
metric = time-mean |U| on a channel-with-cylinder domain; domain box +
sphere (cylinder) geometry with surface refinement; ``min_metric=0.75``;
export of the fields + weighted SVD.

Run with real OpenFOAM data (requires flowtorch):
    python3 s3_for_cylinder2D_Re100.py /path/to/cylinder2D_case

Without arguments, a synthetic Kármán-vortex-street-like dataset is
generated so the full pipeline runs self-contained.
"""
import sys
from os.path import join

import numpy as np

from sparsespatialsampling_tpu import (
    SparseSpatialSampling, ExportData, CubeGeometry, SphereGeometry,
    write_svd_s_cube_to_file, export_openfoam_fields, load_foam_data)

# domain geometry of the flow_past_cylinder_2D case (flowtorch dataset)
BOUNDS = [[0.0, 0.0], [2.2, 0.41]]          # [[xmin, ymin], [xmax, ymax]]
CYLINDER = [[0.2, 0.2], 0.05]               # [center, radius]


def synthetic_case(n_points: int = 150_000, n_snapshots: int = 40, seed: int = 0):
    """Kármán-street-like synthetic data on a random cloud."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(BOUNDS[0], BOUNDS[1], size=(n_points, 2))
    r = np.linalg.norm(xy - CYLINDER[0], axis=1)
    keep = r > CYLINDER[1]
    xy, r = xy[keep], r[keep]
    x, y = xy[:, 0], xy[:, 1]

    times = np.arange(n_snapshots) * 0.05
    # oscillating wake behind the cylinder
    snaps = np.stack([
        np.exp(-((y - 0.2 - 0.05 * np.sin(12 * (x - 0.2) - 8 * t)) ** 2) / 0.004)
        * np.exp(-np.maximum(x - 0.2, 0) / 1.0) * (x > 0.2)
        + 0.5 * np.exp(-(r - CYLINDER[1]) / 0.05)
        for t in times], axis=-1).astype(np.float32)
    metric = snaps.mean(axis=-1).astype(np.float64)  # time-mean |U| analog
    write_times = [f"{t:.2f}" for t in times]
    return xy, metric, snaps, write_times


def main():
    save_path = "./s3_output_cylinder2D"
    geometries = [
        CubeGeometry("domain", True, BOUNDS[0], BOUNDS[1]),
        SphereGeometry("cylinder", False, CYLINDER[0], CYLINDER[1],
                       refine=True, min_refinement_level=9),
    ]

    if len(sys.argv) > 1:
        load_path = sys.argv[1]
        data, xy, _, write_times = load_foam_data(
            load_path, BOUNDS, field_name="U", n_dims=2, t_start=4.0, scalar=False)
        metric = np.linalg.norm(data, axis=1).mean(axis=-1)
    else:
        xy, metric, snaps, write_times = synthetic_case()

    s3 = SparseSpatialSampling(
        xy, metric, geometries, save_path=save_path,
        save_name="cylinder2D_Re100", uniform_levels=5, min_metric=0.75)
    s3.execute_grid_generation()

    export = ExportData(s3, write_times=write_times)
    if len(sys.argv) > 1:
        export_openfoam_fields(export, sys.argv[1], BOUNDS)
    else:
        export.export(xy, snaps[:, None, :], "U_mag",
                      n_snapshots_total=len(write_times))

    field = "U" if len(sys.argv) > 1 else "U_mag"
    write_svd_s_cube_to_file(field, save_path, "cylinder2D_Re100", new_file=False)
    print("done:", join(save_path, "cylinder2D_Re100.h5"))


if __name__ == "__main__":
    main()

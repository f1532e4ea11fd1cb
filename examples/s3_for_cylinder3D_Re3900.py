"""Cylinder-3D (Re=3900) workload — TPU-native S³.

Mirror of the reference example ``examples/s3_for_cylinder3D_Re3900.py``:
3D octree refinement with a ``CylinderGeometry3D`` obstacle, metric = TKE,
snapshot-wise batched export to bound host RAM, reload of the pickled
``s_cube`` checkpoint to skip regeneration, and a ``min_metric`` sweep.

Without arguments a synthetic turbulent-wake-like dataset is generated.
"""
import sys
from os import path

import numpy as np

from sparsespatialsampling_tpu import (
    SparseSpatialSampling, ExportData, CubeGeometry, CylinderGeometry3D,
    write_svd_s_cube_to_file, load_s_cube)

BOUNDS = [[0.0, 0.0, 0.0], [2.2, 0.41, 0.41]]
CYL_AXIS = [[0.2, 0.2, 0.0], [0.2, 0.2, 0.41]]   # axis start/end
CYL_RADIUS = 0.05


def synthetic_case(n_points: int = 200_000, n_snapshots: int = 20, seed: int = 0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(BOUNDS[0], BOUNDS[1], size=(n_points, 3))
    r = np.linalg.norm(xyz[:, :2] - [0.2, 0.2], axis=1)
    keep = r > CYL_RADIUS
    xyz, r = xyz[keep], r[keep]
    x, y, z = xyz.T

    # TKE-like wake metric: strong behind the cylinder, decaying downstream
    metric = ((x > 0.2) * np.exp(-np.maximum(x - 0.25, 0) / 0.8)
              * np.exp(-((y - 0.2) ** 2) / 0.02) + 0.01).astype(np.float64)

    times = np.arange(n_snapshots) * 0.01
    snaps = np.stack([
        metric * (1 + 0.3 * np.sin(10 * x - 20 * t) * np.cos(8 * z))
        for t in times], axis=-1).astype(np.float32)
    return xyz, metric, snaps, [f"{t:.3f}" for t in times]


def export_fields_snapshot_wise(s3, xyz, snaps, write_times, field="k"):
    """Stream snapshots one at a time through the export (the reference's
    RAM-bounding pattern, ``examples/s3_for_cylinder3D_Re3900.py:28-69``)."""
    export = ExportData(s3, write_times=write_times)
    n_total = len(write_times)
    for i in range(n_total):
        export.export(xyz, snaps[:, None, i:i + 1], field, n_snapshots_total=n_total)
    return export


def main():
    save_path = "./s3_output_cylinder3D"
    geometries = [
        CubeGeometry("domain", True, BOUNDS[0], BOUNDS[1]),
        CylinderGeometry3D("cylinder", False, CYL_AXIS, CYL_RADIUS,
                           refine=True, min_refinement_level=7),
    ]

    xyz, metric, snaps, write_times = synthetic_case()

    for min_metric in (0.25, 0.5, 0.75):
        name = f"cylinder3D_Re3900_metric_{min_metric}"
        checkpoint = path.join(save_path, f"s_cube_{name}.pt")

        if path.isfile(checkpoint):
            # reuse an existing grid instead of regenerating (tutorial-4 path)
            s3 = load_s_cube(checkpoint)
        else:
            s3 = SparseSpatialSampling(
                xyz, metric, geometries, save_path=save_path, save_name=name,
                uniform_levels=4, min_metric=min_metric)
            s3.execute_grid_generation()

        export_fields_snapshot_wise(s3, xyz, snaps, write_times)
        write_svd_s_cube_to_file("k", save_path, name, new_file=False)
        print(f"min_metric={min_metric}: {s3.faces.shape[0]} cells")


if __name__ == "__main__":
    main()

"""OAT15A transonic-buffet workload — TPU-native S³.

Mirror of the reference example ``examples/s3_for_OAT15_airfoil.py``:
2D transonic airfoil buffet, metric = std(Ma) over time, airfoil modeled
as an arbitrary closed polygon (``GeometryCoordinates2D``), sweeping the
target captured metric 0.25 → 0.75.

Without real data a synthetic shock-oscillation dataset with a NACA-ish
polygon airfoil is generated.
"""
import numpy as np

from sparsespatialsampling_tpu import (
    SparseSpatialSampling, ExportData, GeometryCoordinates2D, CubeGeometry,
    write_svd_s_cube_to_file)

BOUNDS = [[-0.5, -0.5], [1.5, 0.5]]


def naca_polygon(n: int = 100, thickness: float = 0.12) -> np.ndarray:
    """Closed symmetric NACA-00xx-like polygon with chord [0, 1]."""
    x = 0.5 * (1 - np.cos(np.linspace(0, np.pi, n)))  # cosine spacing
    yt = 5 * thickness * (0.2969 * np.sqrt(x) - 0.1260 * x - 0.3516 * x ** 2
                          + 0.2843 * x ** 3 - 0.1036 * x ** 4)
    upper = np.stack([x, yt], axis=1)
    lower = np.stack([x[::-1], -yt[::-1]], axis=1)
    return np.concatenate([upper, lower[1:]], axis=0)


def synthetic_case(n_points: int = 250_000, n_snapshots: int = 60, seed: int = 0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(BOUNDS[0], BOUNDS[1], size=(n_points, 2))
    poly = naca_polygon()

    # drop points inside the airfoil (even-odd rule, vectorized)
    x, y = xy[:, 0], xy[:, 1]
    inside = np.zeros(len(xy), dtype=bool)
    px, py = poly[:, 0], poly[:, 1]
    for i in range(len(poly)):
        j = i - 1
        cross = ((py[i] > y) != (py[j] > y)) & (
            x < (px[j] - px[i]) * (y - py[i]) / (py[j] - py[i] + 1e-30) + px[i])
        inside ^= cross
    xy = xy[~inside]
    x, y = xy[:, 0], xy[:, 1]

    # oscillating shock on the suction side: std(Ma) ridge whose x-position
    # moves with the buffet cycle
    times = np.linspace(0, 2 * np.pi, n_snapshots, endpoint=False)
    shock_x = 0.45 + 0.08 * np.sin(times)
    snaps = np.stack([
        np.exp(-((x - sx) ** 2) / 0.001) * np.exp(-np.maximum(y, 0) ** 2 / 0.01)
        * (y > 0) + 0.05
        for sx in shock_x], axis=-1).astype(np.float32)
    metric = snaps.std(axis=-1).astype(np.float64)
    return xy, metric, snaps, [f"{t:.4f}" for t in np.arange(n_snapshots) * 5e-4], poly


def main():
    save_path = "./s3_output_oat15"
    xy, metric, snaps, write_times, poly = synthetic_case()

    for min_metric in (0.25, 0.5, 0.75):
        name = f"OAT15_metric_{min_metric}"
        geometries = [
            CubeGeometry("domain", True, BOUNDS[0], BOUNDS[1]),
            GeometryCoordinates2D("airfoil", False, poly, refine=True,
                                  min_refinement_level=8),
        ]
        s3 = SparseSpatialSampling(
            xy, metric, geometries, save_path=save_path, save_name=name,
            uniform_levels=5, min_metric=min_metric, pre_select_cells=True)
        s3.execute_grid_generation()

        export = ExportData(s3, write_times=write_times)
        export.export(xy, snaps[:, None, :], "Ma", n_snapshots_total=len(write_times))
        write_svd_s_cube_to_file("Ma", save_path, name, new_file=False)
        print(f"min_metric={min_metric}: {s3.faces.shape[0]} cells, "
              f"captured {s3.data_final_mesh['metric_per_iter'][-1]:.3f}")


if __name__ == "__main__":
    main()

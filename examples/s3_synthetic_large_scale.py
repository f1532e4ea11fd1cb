"""Large-scale synthetic 3D workload with multi-chip sharding.

The BASELINE configuration "synthetic 100M-cell 3D field, 1k snapshots"
scaled down by default so it runs on one chip; pass ``--full`` on a pod
slice. Demonstrates the scale-out path for every heavy stage:

- grid generation on a multi-million-point cloud (single-chip engine —
  the adaptive loop is host-orchestrated, device-batched)
- snapshot interpolation sharded over the cells axis
- distributed randomized SVD with psum Gram reductions

Run:  python3 s3_synthetic_large_scale.py [--points 2e6] [--snaps 100]
"""
import argparse
import time

import numpy as np

from sparsespatialsampling_tpu import SparseSpatialSampling, CubeGeometry
from sparsespatialsampling_tpu.parallel import (
    make_mesh, sharded_interpolate, distributed_rsvd)
from sparsespatialsampling_tpu.ops.knn import KNNIndex


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=float, default=2e6,
                    help="original CFD points")
    ap.add_argument("--snaps", type=int, default=100, help="snapshots")
    ap.add_argument("--n-cells", type=float, default=2e5,
                    help="target grid cells")
    args = ap.parse_args()

    n_points, n_snaps = int(args.points), args.snaps
    rng = np.random.default_rng(0)

    print(f"generating {n_points:.0f}-point synthetic turbulent-wake cloud...")
    xyz = rng.uniform([0, 0, 0], [4, 1, 1], size=(n_points, 3)).astype(np.float32)
    metric = (np.exp(-np.maximum(xyz[:, 0] - 0.5, 0))
              * np.exp(-((xyz[:, 1] - 0.5) ** 2 + (xyz[:, 2] - 0.5) ** 2) / 0.1)
              + 0.01).astype(np.float64)

    t0 = time.perf_counter()
    s3 = SparseSpatialSampling(
        xyz, metric, [CubeGeometry("domain", True, [0, 0, 0], [4, 1, 1])],
        save_path="./s3_large", save_name="large",
        uniform_levels=4, n_cells_max=int(args.n_cells),
        # 2000/iteration keeps the refinement on the device-resident loop
        # (bigger budgets fall back to one host round trip per iteration)
        n_cells_iter_start=2000)
    s3.execute_grid_generation()
    t_refine = time.perf_counter() - t0
    n_cells = s3.faces.shape[0]
    print(f"refine: {t_refine:.1f}s, {n_cells} cells "
          f"({n_cells / t_refine:.0f} cells/s)")

    mesh = make_mesh()
    print(f"mesh: {mesh.devices.size} device(s)")

    # sharded interpolation of streamed snapshot batches
    knn = KNNIndex(xyz)
    w, idx = knn.weights(s3.centers, 26)

    t0 = time.perf_counter()
    batch = 20
    outs = []
    gb = 0.0
    for lo in range(0, n_snaps, batch):
        hi = min(lo + batch, n_snaps)
        snaps = (metric[:, None, None]
                 * (1 + 0.1 * rng.standard_normal((1, 1, hi - lo)))).astype(np.float32)
        gb += snaps.nbytes / 1e9
        outs.append(sharded_interpolate(w, idx, snaps, mesh))
    t_interp = time.perf_counter() - t0
    data = np.concatenate(outs, axis=-1)[:, 0, :]
    print(f"interp: {t_interp:.1f}s for {n_snaps} snapshots "
          f"({gb / t_interp:.2f} GB/s source-side)")

    # distributed weighted rSVD
    h = s3.size_initial_cell / np.exp2(s3.levels.astype(np.float64)).squeeze()
    weights_cells = (h ** 3).astype(np.float32)
    t0 = time.perf_counter()
    a = (data - data.mean(-1, keepdims=True)) * np.sqrt(weights_cells)[:, None]
    u, sv, v = distributed_rsvd(a, rank=20, mesh=mesh)
    t_svd = time.perf_counter() - t0
    print(f"rSVD rank 20: {t_svd:.1f}s; leading singular values {sv[:3].round(3)}")


if __name__ == "__main__":
    main()

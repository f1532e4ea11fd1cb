"""Measure the device-loop SKELETON cost: stub the fused epoch core with a
constant-output function of the same signature, then run the STL workload's
adaptive phase and read the per-iteration wall from ``adaptive_split``.

skeleton/iter = per-iter with stub;  core/iter = real per-iter - skeleton.
"""
import os
import time
import tempfile

import numpy as np


def main():
    import jax.numpy as jnp
    from bench import synthetic_sphere_stl
    from sparsespatialsampling_tpu.engine.tree import SamplingTree
    from sparsespatialsampling_tpu import CubeGeometry, GeometrySTL3D

    tmp = tempfile.mkdtemp()
    stl_path = os.path.join(tmp, "sphere.stl")
    synthetic_sphere_stl(stl_path)
    bounds = [[0.0, 0.0, 0.0], [0.6, 0.4, 0.4]]
    rng = np.random.default_rng(2)
    xyz = rng.uniform(bounds[0], bounds[1], size=(220_000, 3))
    rr = np.linalg.norm(xyz - [0.2, 0.2, 0.2], axis=1)
    xyz = xyz[rr > 0.05][:200_000]
    metric = (np.exp(-np.maximum(np.linalg.norm(
        xyz - [0.2, 0.2, 0.2], axis=1) - 0.05, 0) / 0.1) + 0.01)
    geometries = [
        CubeGeometry("domain", True, bounds[0], bounds[1]),
        GeometrySTL3D("sphere", False, stl_path, refine=True,
                      min_refinement_level=6),
    ]
    tree = SamplingTree(xyz, metric, geometries, n_cells=40_000,
                        uniform_level=4)

    # force the epoch-kernel build (lazy) by running refine on a CLONE?
    # cheaper: run refine once untouched to build everything, then rebuild
    # a fresh tree, swap the core for a stub, and run refine again.
    t0 = time.perf_counter()
    tree.refine()
    real = tree.data_final_mesh["adaptive_split"]
    print(f"real : refine {time.perf_counter() - t0:.2f}s  split {real}")

    tree2 = SamplingTree(xyz, metric, geometries, n_cells=40_000,
                         uniform_level=4)

    # stub with the same [M, 4] output: constant gain 1, metric 0.5,
    # valid, not-bad — skeleton runs the same selection/split/scatter work
    orig_build = tree2._build_epoch_fn

    def patched_build(*a, **kw):
        orig_build(*a, **kw)
        if tree2._dil_core is not None:
            def stub(coords, level, *args):
                m = coords.shape[0]
                out = jnp.ones((m, 4), dtype=jnp.float32)
                return out * jnp.asarray([1.0, 0.5, 0.0, 0.0],
                                         dtype=jnp.float32)
            tree2._dil_core = stub

    tree2._build_epoch_fn = patched_build
    t0 = time.perf_counter()
    tree2.refine()
    stub_split = tree2.data_final_mesh["adaptive_split"]
    print(f"stub : refine {time.perf_counter() - t0:.2f}s  split {stub_split}")
    ri = real["t_epoch"] / max(real["n_iter"], 1)
    si = stub_split["t_epoch"] / max(stub_split["n_iter"], 1)
    print(f"per-iter real {ri * 1e3:.1f} ms | skeleton {si * 1e3:.1f} ms | "
          f"core-in-loop {1e3 * (ri - si):.1f} ms")


if __name__ == "__main__":
    main()

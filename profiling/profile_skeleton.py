"""Measure the device-loop SKELETON cost and the in-loop ring-rescue cost.

Variants (each a fresh tree on the same workload):
  real     — unmodified refine.
  stub     — the fused epoch core replaced by a constant-output stub of the
             same signature: per-iteration wall = loop skeleton (top-k,
             scatters, while overhead, state wire time amortized).
  noring   — ``_RING_PLAN = ()``: core without the fused rescue passes
             (bad cells exit to the host escalation instead).

Usage: python profile_skeleton.py [--c3d]
"""
import os
import sys
import time
import tempfile

import numpy as np


def build_tree(c3d: bool, tmp: str):
    from bench import synthetic_sphere_stl, synthetic_cylinder3d
    from sparsespatialsampling_tpu.engine.tree import SamplingTree
    from sparsespatialsampling_tpu import (CubeGeometry, GeometrySTL3D,
                                           CylinderGeometry3D)
    if c3d:
        xyz, metric, bounds = synthetic_cylinder3d()
        geometries = [
            CubeGeometry("domain", True, bounds[0], bounds[1]),
            CylinderGeometry3D("cylinder", False,
                               [[0.2, 0.2, 0.0], [0.2, 0.2, 0.41]], 0.05,
                               refine=True, min_refinement_level=7),
        ]
        return SamplingTree(xyz, metric, geometries, n_cells=150_000,
                            uniform_level=5)
    stl_path = os.path.join(tmp, "sphere.stl")
    if not os.path.exists(stl_path):
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
    return SamplingTree(xyz, metric, geometries, n_cells=40_000,
                        uniform_level=4)


def run(tree, label):
    t0 = time.perf_counter()
    tree.refine()
    split = tree.data_final_mesh["adaptive_split"]
    es = tree.data_final_mesh.get("epoch_stats") or {}
    per = split["t_epoch"] / max(split["n_iter"], 1)
    print(f"{label:7s}: refine {time.perf_counter() - t0:6.2f}s  "
          f"adaptive {tree.data_final_mesh['t_adaptive']:6.2f}s  "
          f"per-iter {per * 1e3:6.1f} ms  n_iter {split['n_iter']}  "
          f"n_bad {es.get('n_bad_cells', '?')} "
          f"calls main/ring/full {es.get('n_calls_main', '?')}/"
          f"{es.get('n_calls_ring', '?')}/{es.get('n_calls_full', '?')}")
    return per


def main():
    import jax.numpy as jnp
    from sparsespatialsampling_tpu.engine import tree as tree_mod

    c3d = "--c3d" in sys.argv
    tmp = tempfile.mkdtemp()

    run(build_tree(c3d, tmp), "real")

    t2 = build_tree(c3d, tmp)
    orig_build = t2._build_epoch_fn

    def patched_build(*a, **kw):
        orig_build(*a, **kw)
        if t2._dil_core is not None:
            def stub(coords, level, *args):
                m = coords.shape[0]
                out = jnp.ones((m, 4), dtype=jnp.float32)
                return out * jnp.asarray([1.0, 0.5, 0.0, 0.0],
                                         dtype=jnp.float32)
            t2._dil_core = stub

    t2._build_epoch_fn = patched_build
    run(t2, "stub")

    old_sizes = tree_mod._RING_PLAN
    tree_mod._RING_PLAN = ()
    try:
        run(build_tree(c3d, tmp), "noring")
    finally:
        tree_mod._RING_PLAN = old_sizes


if __name__ == "__main__":
    main()

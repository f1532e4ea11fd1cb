"""Decompose the device-resident adaptive loop's per-iteration cost (TPU).

Times, on the c3d north-star workload state right after the uniform phase:
  1. the raw dilated epoch kernel alone (36,864 queries),
  2. one _device_adaptive_call with _DEVICE_LOOP_ITERS = 1, 8, 64,
so the per-iteration in-loop cost and the per-call fixed cost (upload +
program load + readback) separate.  Dev tool — not part of bench.py.
"""
import time

import numpy as np

from bench import synthetic_cylinder3d


def main():
    import tempfile
    from sparsespatialsampling_tpu import (
        SparseSpatialSampling, CubeGeometry, CylinderGeometry3D)
    from sparsespatialsampling_tpu.engine.tree import SamplingTree
    import jax
    import jax.numpy as jnp

    # absorb the channel-init stall
    t0 = time.perf_counter()
    np.asarray(jnp.zeros((8,)) + 1.0)
    print(f"channel init: {time.perf_counter() - t0:.2f} s")

    xyz, metric, bounds = synthetic_cylinder3d()
    geoms = [
        CubeGeometry("domain", True, bounds[0], bounds[1]),
        CylinderGeometry3D("cylinder", False,
                           [[0.2, 0.2, 0.0], [0.2, 0.2, 0.41]], 0.05,
                           refine=True, min_refinement_level=7),
    ]
    tmp = tempfile.mkdtemp()
    s3 = SparseSpatialSampling(
        xyz, metric, geoms, save_path=tmp, save_name="p",
        uniform_levels=5, n_cells_max=150_000)
    tree = s3._sampling

    # run the uniform phase only, then snapshot the state
    t0 = time.perf_counter()
    tree._refine_uniform()
    print(f"uniform: {time.perf_counter() - t0:.2f} s")
    tree._n_cells_after_uniform = int(tree._alive.sum())
    tree._n_cells_log.append(int(tree._alive.sum()))

    # 1. raw epoch kernel at the in-loop batch size (4096 cells)
    alive = tree._alive_idx()
    sel = alive[:4096]
    if tree._epoch_fn is None:
        tree._build_epoch_fn()
    for tag in ("cold", "warm", "warm"):
        t0 = time.perf_counter()
        fut = tree._dispatch_epoch(sel, tree._epoch_fn)
        t_disp = time.perf_counter() - t0
        np.asarray(fut)
        print(f"epoch kernel 4096 cells [{tag}]: dispatch {t_disp:.3f} s, "
              f"total {time.perf_counter() - t0:.3f} s")

    # 2. device loop at increasing iteration caps (fresh compiles are
    #    reported separately by the first call at each cap)
    snap = {n: getattr(tree, n).copy() for n in
            ("_coords", "_level", "_alive", "_gain", "_metric_arr")}
    scal = {n: getattr(tree, n) for n in
            ("_n_cells", "_current_max_level", "_cells_per_iter",
             "_cells_per_iter_last")}
    lists = {n: list(getattr(tree, n)) for n in ("_metric", "_n_cells_log")}
    for iters in (1, 8, 64):
        for name, v in snap.items():
            setattr(tree, name, v.copy())
        for name, v in scal.items():
            setattr(tree, name, v)
        for name, v in lists.items():
            setattr(tree, name, list(v))
        tree._dev_state = None
        tree._device_loops = {}
        SamplingTree._DEVICE_LOOP_ITERS = iters
        st = tree._epoch_stats
        for k in st:
            st[k] = 0 if isinstance(st[k], int) else 0.0
        t0 = time.perf_counter()
        ran = tree._device_adaptive_call()
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        ran2 = tree._device_adaptive_call()
        t_second = time.perf_counter() - t0
        print(f"ITERS={iters:3d}: call1 {t_first:.3f} s ({ran} iters), "
              f"call2 {t_second:.3f} s ({ran2} iters), "
              f"dispatch {st['t_dispatch_s']:.3f} readback "
              f"{st['t_readback_s']:.3f} bad {st['n_bad_cells']}")
    SamplingTree._DEVICE_LOOP_ITERS = 64


if __name__ == "__main__":
    main()

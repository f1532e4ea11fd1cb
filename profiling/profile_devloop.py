"""Decompose the device-loop per-iteration cost on the real TPU.

Builds the bench STL workload's SamplingTree, then times (chained data
dependencies, ONE device_get sync — ``block_until_ready`` lies through the
axon tunnel):

  1. the fused epoch core (``fn_grid_dil``) at the device loop's
     ``k_max * 2^d`` query batch,
  2. the geometry-validity part alone (STL sign grid + exact winding),
  3. ``lax.top_k`` over the loop's padded capacity,
  4. the full device loop (per-iteration wall from ``adaptive_split``).

Run with the c3d workload instead via ``--c3d``.
"""
import sys
import time
import tempfile

import numpy as np


def chain_time(fn, arg_fn, n_iter=16):
    """Per-call seconds for fn: chained via a scalar data dependency, one
    sync at the end (tunnel-safe protocol, CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    # warm
    out = fn(*arg_fn(jnp.float32(0.0)))
    feed = jnp_first_scalar(out) * 0.0
    float(jax.device_get(feed))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*arg_fn(feed))
        feed = jnp_first_scalar(out) * 0.0  # stays on device
    float(jax.device_get(feed))
    return (time.perf_counter() - t0) / n_iter


def jnp_first_scalar(out):
    import jax.numpy as jnp
    if isinstance(out, (tuple, list)):
        out = out[0]
    return jnp.sum(out).astype(jnp.float32)


def main():
    from bench import synthetic_sphere_stl, synthetic_cylinder3d
    from sparsespatialsampling_tpu.engine.tree import SamplingTree
    from sparsespatialsampling_tpu import (CubeGeometry, GeometrySTL3D,
                                           CylinderGeometry3D)
    import os
    import jax
    import jax.numpy as jnp

    tmp = tempfile.mkdtemp()
    if "--c3d" in sys.argv:
        xyz, metric, bounds = synthetic_cylinder3d()
        geometries = [
            CubeGeometry("domain", True, bounds[0], bounds[1]),
            CylinderGeometry3D("cylinder", False,
                               [[0.2, 0.2, 0.0], [0.2, 0.2, 0.41]], 0.05,
                               refine=True, min_refinement_level=7),
        ]
        tree = SamplingTree(xyz, metric, geometries, n_cells=150_000,
                            uniform_level=5)
    else:
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

    t0 = time.perf_counter()
    tree.refine()
    t_refine = time.perf_counter() - t0
    dfm = tree.data_final_mesh
    split = dfm.get("adaptive_split") or {}
    print(f"refine {t_refine:.2f}s adaptive {dfm['t_adaptive']:.2f}s "
          f"split {split}")
    per_iter = (split.get("t_epoch", 0.0) / max(split.get("n_iter", 1), 1))
    print(f"device-loop per-iter: {per_iter * 1e3:.1f} ms")

    d = tree._n_dimensions
    n_ch = 2 ** d
    k_max = tree._device_loop_kmax()
    q = k_max * n_ch
    print(f"k_max={k_max} core batch={q} cells")

    # representative cells: the last q created (cluster near the surface)
    n = tree._n_cells
    sel = np.arange(max(n - q, 0), n)
    coords = np.zeros((q, d), dtype=np.int32)
    level = np.zeros(q, dtype=np.float32)
    coords[-len(sel):] = tree._coords[sel]
    level[-len(sel):] = tree._level[sel]
    coords_j = jnp.asarray(coords)
    level_j = jnp.asarray(level)

    core = jax.jit(tree._dil_core)
    args = tree._dil_core_args

    t = chain_time(
        core, lambda f: (coords_j + f.astype(jnp.int32), level_j) + args)
    print(f"core (fn_grid_dil)      : {t * 1e3:7.1f} ms/call")

    geometry_and_gain, query_centers, geometry_invalid, gain_tail = \
        tree._epoch_helpers()
    lo, width, gain0, dirs, offsets, shift = tree._epoch_common_args()
    geo = jax.jit(lambda c, l: geometry_invalid(c, l, lo, width, offsets))
    t = chain_time(geo, lambda f: (coords_j + f.astype(jnp.int32), level_j))
    print(f"geometry_invalid alone  : {t * 1e3:7.1f} ms/call")

    # top_k over the loop's padded capacity
    need = tree._n_cells + tree._DEVICE_LOOP_ITERS * k_max * n_ch + 1
    cap = 1 << int(need - 1).bit_length()
    g = jnp.asarray(np.random.default_rng(0).normal(size=cap)
                    .astype(np.float32))
    topk = jax.jit(lambda x: jax.lax.top_k(x, k_max))
    t = chain_time(topk, lambda f: (g + f,))
    print(f"top_k(cap={cap}, k={k_max}): {t * 1e3:7.1f} ms/call")

    def two_stage(x, k, block):
        nb = x.shape[0] // block
        xb = x.reshape(nb, block)
        _, bids = jax.lax.top_k(xb.max(axis=1), k)
        bids = jnp.sort(bids)
        cand = xb[bids].reshape(-1)
        cidx = (bids[:, None] * block
                + jnp.arange(block)[None, :]).reshape(-1)
        v, i = jax.lax.top_k(cand, k)
        return v, cidx[i]

    for block in (32, 64, 128):
        ts = jax.jit(lambda x, b=block: two_stage(x, k_max, b))
        t = chain_time(ts, lambda f: (g + f,))
        print(f"two-stage top_k block={block:3d}: {t * 1e3:7.1f} ms/call")
        v0, i0 = topk(g)
        v1, i1 = ts(g)
        ok = (np.array_equal(np.asarray(v0), np.asarray(v1))
              and np.array_equal(np.asarray(i0), np.asarray(i1)))
        print(f"  matches plain top_k: {ok}")


if __name__ == "__main__":
    main()

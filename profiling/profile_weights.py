"""Stage-level profile of the export weight-cache build (t_weights) on the
c3d workload: where do 13-23 s go for 151k queries?"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import synthetic_cylinder3d


def main():
    from sparsespatialsampling_tpu.ops import knn as K
    # channel-init warmup (isolated)
    t0 = time.perf_counter()
    np.asarray(jnp.zeros((8,)) + 1.0)
    print(f"channel_init {time.perf_counter()-t0:.2f} s")

    xyz, metric, bounds = synthetic_cylinder3d()
    t0 = time.perf_counter()
    idx = K.KNNIndex(xyz)
    print(f"index build {time.perf_counter()-t0:.2f} s "
          f"(grid: {idx._grid is not None}, dil: {'dil_pts' in (idx._grid or {})})")

    # synthetic cell centers: 151k random points in-domain (stand-in for the
    # real S3 centers — same count/distribution class)
    rng = np.random.default_rng(9)
    centers = rng.uniform(bounds[0], bounds[1], size=(151_370, 3))

    for run in (1, 2):
        t0 = time.perf_counter()
        g = idx._grid
        n = centers.shape[0]
        queries = np.asarray(centers, dtype=np.float64) - idx._shift
        chunk = idx._grid_chunk
        n_pad = -(-n // chunk) * chunk
        qf32 = np.zeros((n_pad, idx.n_dim), dtype=np.float32)
        qf32[:n] = queries
        t_prep = time.perf_counter() - t0

        t0 = time.perf_counter()
        parts = []
        for lo in range(0, n_pad, chunk):
            qarr = jnp.asarray(qf32[lo:lo + chunk])
            parts.append(K._grid_query_kernel_dil(
                qarr, g["dil_pts"], g["dil_cand"], g["dil_ovf"],
                g["origin"], g["inv_h"], g["dims"], g["smat"], 26))
        t_dispatch = time.perf_counter() - t0

        t0 = time.perf_counter()
        jax.block_until_ready(parts)
        t_compute = time.perf_counter() - t0

        t0 = time.perf_counter()
        bad = 0
        for i, (_, _, ok) in enumerate(parts):
            okh = np.asarray(ok)
            bad += int((~okh).sum())
        t_ok_readback = time.perf_counter() - t0

        t0 = time.perf_counter()
        sq_dev = jnp.concatenate([p[0] for p in parts])
        idx_dev = jnp.concatenate([p[1] for p in parts])
        if not hasattr(idx, "_perm_pad_dev"):
            idx._perm_pad_dev = jnp.asarray(idx._perm_pad.astype(np.int32))
        w_dev, idx_orig = K._finish_weights(sq_dev, idx_dev, idx._perm_pad_dev)
        jax.block_until_ready((w_dev, idx_orig))
        t_finish = time.perf_counter() - t0

        print(f"run{run}: chunk={chunk} n_chunks={n_pad//chunk} "
              f"prep {t_prep:.2f} dispatch {t_dispatch:.2f} "
              f"compute {t_compute:.2f} ok_readback {t_ok_readback:.2f} "
              f"(bad={bad}) finish {t_finish:.2f}")

    # fallback cost for ~1024 rows
    t0 = time.perf_counter()
    sq_fix, idx_fix = idx._full_scan(
        np.asarray(centers[:1024], np.float64) - idx._shift, 26, "query")
    print(f"fallback full scan 1024 rows {time.perf_counter()-t0:.2f} s")


if __name__ == "__main__":
    main()

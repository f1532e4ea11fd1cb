"""Probe: split the export weight-cache build (`KNNIndex.weights`) into
kernel+readback vs host recompute, and measure whether a uint16
row-relative delta encoding of the [Q, k] index readback would pay.

Run on the real TPU (no args). Chains device work through data deps and
syncs via jax.device_get of the final array (block_until_ready is not
reliable through the axon tunnel).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparsespatialsampling_tpu.ops.knn import KNNIndex


def synthetic_cylinder3d(n=500_000, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform([0, 0, 0], [2.2, 0.41, 0.41], size=(n, 3))
    return xyz


def main():
    xyz = synthetic_cylinder3d()
    rng = np.random.default_rng(1)
    q = xyz[rng.choice(len(xyz), size=151_000, replace=False)] \
        + rng.normal(scale=1e-3, size=(151_000, 3))
    k = 26

    t0 = time.perf_counter()
    idx_obj = KNNIndex(xyz)
    print(f"index build: {time.perf_counter() - t0:.3f} s")

    # warmup (compiles + channel init)
    w, i = idx_obj.weights(q[:1024], k)
    print("warmup done")

    for rep in range(3):
        t0 = time.perf_counter()
        q64 = np.asarray(q, dtype=np.float64) - idx_obj._shift
        idx_sorted = idx_obj._grid_run(q64, k, "query_idx")  # incl. readback
        t1 = time.perf_counter()
        idx = idx_obj._perm_pad[idx_sorted]
        nbr = idx_obj._points_host32[idx]
        diff = nbr - q64[:, None, :].astype(np.float32)
        dists = np.sqrt(np.maximum((diff * diff).sum(-1), 0.0))
        wgt = 1.0 / np.clip(dists, 1e-12, None)
        wgt /= wgt.sum(axis=1, keepdims=True)
        t2 = time.perf_counter()
        mb = idx_sorted.size * 4 / 1e6
        print(f"rep{rep}: kernel+readback {t1-t0:.3f} s ({mb:.1f} MB, "
              f"{mb/(t1-t0):.1f} MB/s)  host recompute {t2-t1:.3f} s")

    # --- uint16 delta readback feasibility + timing --------------------- #
    spread = idx_sorted.max(axis=1) - idx_sorted.min(axis=1)
    n_over = int((spread >= 65536).sum())
    print(f"rows with index spread >= 65536: {n_over} / {len(spread)} "
          f"(max spread {int(spread.max())})")

    @jax.jit
    def pack(i32):
        base = i32.min(axis=1)
        delta = i32 - base[:, None]
        ok = (delta < 65536).all(axis=1)
        return base, delta.astype(jnp.uint16), ok

    i_dev = jnp.asarray(idx_sorted.astype(np.int32))
    for rep in range(3):
        t0 = time.perf_counter()
        base, delta, ok = pack(i_dev)
        b = np.asarray(base)
        d = np.asarray(delta)
        o = np.asarray(ok)
        rebuilt = b[:, None].astype(np.int64) + d
        t1 = time.perf_counter()
        mb = (b.nbytes + d.nbytes + o.nbytes) / 1e6
        assert (rebuilt[o] == idx_sorted[o]).all()
        print(f"packed rep{rep}: {t1-t0:.3f} s ({mb:.1f} MB, "
              f"{mb/(t1-t0):.1f} MB/s)")


if __name__ == "__main__":
    main()

"""Interleaved A/B: raw int32 [Q,k] index readback vs uint16 delta packing
(+ int32 overflow-row fixup), with the grid-query kernel time isolated via
a 1-element sync readback. Run on the real TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparsespatialsampling_tpu.ops.knn import KNNIndex


def main():
    rng = np.random.default_rng(0)
    xyz = rng.uniform([0, 0, 0], [2.2, 0.41, 0.41], size=(500_000, 3))
    q = xyz[rng.choice(len(xyz), size=151_000, replace=False)] \
        + rng.normal(scale=1e-3, size=(151_000, 3))
    k = 26

    idx_obj = KNNIndex(xyz)
    idx_obj.weights(q[:1024], k)  # warm compiles
    q64 = np.asarray(q, dtype=np.float64) - idx_obj._shift

    @jax.jit
    def pack(i32):
        base = i32.min(axis=1)
        delta = i32 - base[:, None]
        ok = (delta < 65536).all(axis=1)
        return base.astype(jnp.int32), delta.astype(jnp.uint16), ok

    # warm the pack kernel
    dummy = jnp.zeros((151000 // 1 + 24, k), jnp.int32)  # any shape compiles once below

    for rep in range(4):
        # --- kernel only: query_idx but sync via 1-row slice ---------- #
        t0 = time.perf_counter()
        idx_dev = idx_obj._grid_run_device(q64, k) if hasattr(
            idx_obj, "_grid_run_device") else None
        if idx_dev is None:
            # fall back: run full _grid_run (incl readback) then device_put
            idx_host = idx_obj._grid_run(q64, k, "query_idx")
            t1 = time.perf_counter()
            idx_dev = jnp.asarray(idx_host.astype(np.int32))
            print(f"rep{rep}: kernel+raw-readback {t1-t0:.3f} s")
        # --- A: raw int32 readback ------------------------------------ #
        t0 = time.perf_counter()
        raw = np.asarray(idx_dev)
        tA = time.perf_counter() - t0
        # --- B: packed readback ---------------------------------------- #
        t0 = time.perf_counter()
        b, d, o = pack(idx_dev)
        bh, dh, oh = np.asarray(b), np.asarray(d), np.asarray(o)
        bad = np.nonzero(~oh)[0]
        if bad.size:
            fix = np.asarray(jnp.take(idx_dev, jnp.asarray(bad), axis=0))
        tB = time.perf_counter() - t0
        rebuilt = bh[:, None].astype(np.int64) + dh
        if bad.size:
            rebuilt[bad] = fix
        assert (rebuilt == raw).all()
        mbA = raw.nbytes / 1e6
        mbB = (bh.nbytes + dh.nbytes + oh.nbytes
               + (fix.nbytes if bad.size else 0)) / 1e6
        print(f"rep{rep}: raw {tA:.3f} s ({mbA:.1f} MB, {mbA/tA:.1f} MB/s)"
              f"  packed {tB:.3f} s ({mbB:.1f} MB, {mbB/tB:.1f} MB/s)"
              f"  bad {bad.size}")


if __name__ == "__main__":
    main()

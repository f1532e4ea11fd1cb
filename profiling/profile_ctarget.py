"""A/B the bucket-grid member cap (GRID_SHRINK_TARGET 32 vs 16) on the
c3d-shaped workload: epoch-typical query batches, warm kernel wall via
chained device calls (one sync), exact-fallback rates. Run on the TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparsespatialsampling_tpu.ops.knn import KNNIndex


def bench_target(target, xyz, q_epoch, q_export):
    KNNIndex.GRID_SHRINK_TARGET = target
    t0 = time.perf_counter()
    obj = KNNIndex(xyz)
    t_build = time.perf_counter() - t0
    g = obj._grid
    width = (3 ** 3) * g["C"]
    print(f"target={target}: C={g['C']} width={width} h={g['h']:.4f} "
          f"build={t_build:.2f} s", flush=True)

    # warm
    obj.query(q_epoch[:1024], 26)
    for rep in range(3):
        t0 = time.perf_counter()
        d, i = obj.query(q_epoch, 26)
        t1 = time.perf_counter()
        print(f"  epoch-query rep{rep}: {t1-t0:.3f} s "
              f"(fallbacks {obj.last_fallback})", flush=True)
    for rep in range(2):
        t0 = time.perf_counter()
        w, i = obj.weights(q_export, 26)
        t1 = time.perf_counter()
        print(f"  export-weights rep{rep}: {t1-t0:.3f} s "
              f"(fallbacks {obj.last_fallback})", flush=True)
    return d, i


def main():
    rng = np.random.default_rng(0)
    xyz = rng.uniform([0, 0, 0], [2.2, 0.41, 0.41], size=(500_000, 3))
    # epoch-like queries: clustered children near the wake region
    centers = xyz[rng.choice(len(xyz), size=4608, replace=False)]
    off = rng.normal(scale=2e-3, size=(4608, 8, 3))
    q_epoch = (centers[:, None, :] + off).reshape(-1, 3)  # 36864 rows
    q_export = xyz[rng.choice(len(xyz), size=151_000, replace=False)] \
        + rng.normal(scale=1e-3, size=(151_000, 3))

    d32, i32 = bench_target(32, xyz, q_epoch, q_export)
    d16, i16 = bench_target(16, xyz, q_epoch, q_export)
    np.testing.assert_array_equal(i32, i16)
    np.testing.assert_allclose(d32, d16, rtol=0, atol=0)
    print("C=16 vs C=32: bitwise-identical results")


if __name__ == "__main__":
    main()

"""Op-level decomposition of the dilated epoch kNN at c3d shapes:
Q=36864 queries against the 500k-point bucket grid (C=32, 3^3 dilation).

All tables are passed as ARGUMENTS (constant-baking poisons compiles), and
every timing chains calls through a scalar data dependency with one
device_get sync (the tunnel lies to block_until_ready).
"""
import time

import numpy as np


def chain_time(fn, args, n_iter=12):
    import jax
    import jax.numpy as jnp
    out = fn(jnp.float32(0.0), *args)
    feed = jnp.sum(out).astype(jnp.float32) * 0.0
    float(jax.device_get(feed))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(feed, *args)
        feed = jnp.sum(out).astype(jnp.float32) * 0.0
    float(jax.device_get(feed))
    return (time.perf_counter() - t0) / n_iter


def main():
    import jax
    import jax.numpy as jnp
    from bench import synthetic_cylinder3d
    from sparsespatialsampling_tpu.ops.knn import (
        KNNIndex, _grid_query_margin, _topk_canonical)

    xyz, metric, bounds = synthetic_cylinder3d()
    knn = KNNIndex(xyz, values=metric)
    g = knn._grid
    dil_pts, dil_cand = g["dil_pts"], g["dil_cand"]
    origin, inv_h, dims = g["origin"], g["inv_h"], g["dims"]
    print(f"dil_pts {dil_pts.shape} {dil_pts.dtype} "
          f"({dil_pts.nbytes / 1e6:.0f} MB), dil_cand {dil_cand.shape}")

    q_n, k = 36864, 26
    rng = np.random.default_rng(0)
    qs = rng.uniform(bounds[0], bounds[1], size=(q_n, 3)).astype(np.float32)
    qs = jnp.asarray(qs - knn._shift.astype(np.float32))

    flat_np, _ = _grid_query_margin(np.asarray(qs), np.asarray(origin),
                                    np.asarray(inv_h), np.asarray(dims),
                                    dil_pts.shape[0] - 1)
    flat = jnp.asarray(np.asarray(flat_np))

    def t(label, fn, args):
        print(f"{label}: {chain_time(jax.jit(fn), args) * 1e3:7.1f} ms")

    t("gather pts rows only     ",
      lambda f, dp, fl: dp[fl + f.astype(jnp.int32) * 0].sum(),
      (dil_pts, flat))
    t("gather cand rows only    ",
      lambda f, dc, fl: dc[fl + f.astype(jnp.int32) * 0].sum(),
      (dil_cand, flat))
    t("sorted-flat gather pts   ",
      lambda f, dp, fl: dp[fl + f.astype(jnp.int32) * 0].sum(),
      (dil_pts, jnp.sort(flat)))

    def dist_only(f, dp, fl, q):
        g3 = dp[fl].reshape(q_n, -1, 3)
        dd = (q + f)[:, None, :] - g3
        return jnp.sum(dd * dd, axis=-1).sum()
    t("gather + distances       ", dist_only, (dil_pts, flat, qs))

    def dist_topk(f, dp, fl, q):
        g3 = dp[fl].reshape(q_n, -1, 3)
        dd = (q + f)[:, None, :] - g3
        sq = jnp.sum(dd * dd, axis=-1)
        return jax.lax.top_k(-sq, 34)[0].sum()
    t("gather + dist + top_k(34)", dist_topk, (dil_pts, flat, qs))

    def full_canonical(f, dp, dc, fl, q):
        g3 = dp[fl].reshape(q_n, -1, 3)
        dd = (q + f)[:, None, :] - g3
        sq = jnp.sum(dd * dd, axis=-1)
        s, i, sel = _topk_canonical(sq, dc[fl], k)
        return s.sum() + i.sum() + sel.sum()
    t("+ cand gather + canonical", full_canonical,
      (dil_pts, dil_cand, flat, qs))

    # top_k alone at [Q, 864] (no gather)
    sq0 = jnp.asarray(rng.normal(size=(q_n, 864)).astype(np.float32))
    t("top_k(34) on [Q,864] only",
      lambda f, s: jax.lax.top_k(-(s + f), 34)[0].sum(), (sq0,))
    # the canonical 2-key sort tail alone at [Q, 34]
    ts = jnp.asarray(rng.normal(size=(q_n, 34)).astype(np.float32))
    ti = jnp.asarray(rng.integers(0, 1 << 20, size=(q_n, 34)).astype(np.int32))
    t("2-key sort on [Q,34] only",
      lambda f, a, b: jax.lax.sort((a + f, b, b), dimension=1,
                                   num_keys=2)[0].sum(), (ts, ti))


if __name__ == "__main__":
    main()

"""Measure the device-loop's scatter pattern vs a dynamic-update-slice
rewrite at the loop's exact shapes (cap=262144, k_max=256, 3D)."""
import time

import numpy as np


def chain_time(fn, arg_fn, n_iter=24):
    import jax
    import jax.numpy as jnp
    out = fn(*arg_fn(jnp.float32(0.0)))
    if isinstance(out, (tuple, list)):
        out = out[0]
    feed = jnp.sum(out).astype(jnp.float32) * 0.0
    float(jax.device_get(feed))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*arg_fn(feed))
        if isinstance(out, (tuple, list)):
            out = out[0]
        feed = jnp.sum(out).astype(jnp.float32) * 0.0
    float(jax.device_get(feed))
    return (time.perf_counter() - t0) / n_iter


def main():
    import jax
    import jax.numpy as jnp

    cap, k_max, n_ch, d = 262144, 256, 8, 3
    nn = k_max * n_ch
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.integers(0, 63, size=(cap, d), dtype=np.int32))
    gain = jnp.asarray(rng.normal(size=cap).astype(np.float32))
    alive = jnp.asarray(rng.random(cap) < 0.5)
    upd_c = jnp.asarray(rng.integers(0, 63, size=(nn, d), dtype=np.int32))
    upd_g = jnp.asarray(rng.normal(size=nn).astype(np.float32))
    fill = jnp.int32(100_000)
    # valid-prefix mask: 200 of 256 slots valid (typical budget)
    pvalid = jnp.arange(k_max) < 200
    parents = jnp.where(pvalid, jnp.arange(k_max) * 37 % 90_000,
                        cap - 1)

    def scatter_like_loop(c, g, a, f):
        j = jnp.cumsum(pvalid.astype(jnp.int32)) - 1
        rows = jnp.where(pvalid[:, None],
                         fill + j[:, None] * n_ch
                         + jnp.arange(n_ch)[None, :], cap - 1)
        rows_f = rows.reshape(-1)
        c2 = c.at[rows_f].set(upd_c + f.astype(jnp.int32))
        g2 = g.at[rows_f].set(upd_g)
        a2 = a.at[parents].set(False)
        a2 = a2.at[rows_f].set(True)
        return c2, g2, a2

    def dus_like(c, g, a, f):
        # contiguous block write at fill (valid slots are a prefix)
        c2 = jax.lax.dynamic_update_slice(
            c, upd_c + f.astype(jnp.int32), (fill, 0))
        g2 = jax.lax.dynamic_update_slice(g, upd_g, (fill,))
        a2 = a.at[parents].set(False)
        a2 = jax.lax.dynamic_update_slice(
            a2, jnp.repeat(pvalid, n_ch), (fill,))
        return c2, g2, a2

    def parents_only(c, g, a, f):
        a2 = a.at[parents + f.astype(jnp.int32)].set(False)
        return (a2,)

    for name, fn in (("scatter(loop pattern)", scatter_like_loop),
                     ("DUS rewrite        ", dus_like),
                     ("parents scatter only", parents_only)):
        jf = jax.jit(fn)
        t = chain_time(jf, lambda f: (coords, gain, alive, f))
        print(f"{name}: {t * 1e3:7.2f} ms/call")


if __name__ == "__main__":
    main()

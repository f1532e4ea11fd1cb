"""Isolate the while_loop penalty on the fused epoch core.

Measures fn_grid_dil (the c3d device-loop epoch core) three ways:
  A. chained standalone dispatches (the profile_devloop protocol),
  B. inside a trivial lax.while_loop whose state is just the query batch
     (16 iterations, one dispatch) — while_loop embedding alone,
  C. inside a while_loop whose state also carries cap-sized arrays that the
     body scatter-updates and the queries derive from (mimics the real
     device loop's state wiring).
"""
import sys
import time
import tempfile

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from profile_skeleton import build_tree

    tmp = tempfile.mkdtemp()
    tree = build_tree(True, tmp)
    tree._build_epoch_fn()
    core = tree._dil_core
    args = tree._dil_core_args  # already includes the common args
    d = 3
    n_cells = 4096

    rng = np.random.default_rng(0)
    # integer lattice coords at level 6 (c3d-like)
    lev = 6
    coords = rng.integers(0, 2 ** lev, size=(n_cells, d)).astype(np.int32)
    coords_j = jnp.asarray(coords.astype(np.float32))
    level_j = jnp.full((n_cells,), float(lev), dtype=jnp.float32)

    # A: chained standalone
    fn = jax.jit(lambda c, l, *a: core(c, l, *a))
    out = fn(coords_j, level_j, *args)
    float(jax.device_get(out[0, 0]))
    n_iter = 16
    t0 = time.perf_counter()
    feed = out[0, 0] * 0.0
    for _ in range(n_iter):
        out = fn(coords_j + feed, level_j, *args)
        feed = out[0, 0] * 0.0
    float(jax.device_get(feed))
    ta = (time.perf_counter() - t0) / n_iter
    print(f"A standalone chained   : {ta * 1e3:7.1f} ms/call")

    # B: trivial while_loop
    def loop_b(c0, l0, *a):
        def body(s):
            i, c, acc = s
            out = core(c, l0, *a)
            return i + 1, c + out[0, 0] * 0.0, acc + out[:, 0].sum()
        def cond(s):
            return s[0] < n_iter
        return jax.lax.while_loop(cond, body, (0, c0, 0.0))

    fnb = jax.jit(loop_b)
    r = fnb(coords_j, level_j, *args)
    float(jax.device_get(r[2]))
    t0 = time.perf_counter()
    r = fnb(coords_j + r[2] * 0.0, level_j, *args)
    float(jax.device_get(r[2]))
    tb = (time.perf_counter() - t0) / n_iter
    print(f"B while_loop (queries-only state): {tb * 1e3:7.1f} ms/iter")

    # D: loop B but with query cells clustered at the cylinder surface so
    # the exactness margin fails for some queries and the fused ring passes
    # actually fire (the real refinement loop's regime).
    lev_d = 9
    nside = 2 ** lev_d
    # lattice cells whose centers sit within ~1.5 cell widths of the
    # cylinder wall (axis at (0.2, 0.2), r=0.05; domain is the tree root)
    w_cell = float(tree._width) / nside
    lo = np.asarray(tree._lo, dtype=np.float64)
    ii = np.arange(nside)
    cx, cy = np.meshgrid(ii, ii, indexing="ij")
    px = lo[0] + (cx + 0.5) * w_cell
    py = lo[1] + (cy + 0.5) * w_cell
    rr = np.hypot(px - 0.2, py - 0.2)
    near = np.abs(rr - 0.05) < 1.5 * w_cell
    xs, ys = np.nonzero(near)
    reps = int(np.ceil(n_cells / xs.size))
    sel = np.tile(np.arange(xs.size), reps)[:n_cells]
    zz = rng.integers(0, nside, size=n_cells)
    coords_bad = np.stack([xs[sel], ys[sel], zz], axis=1).astype(np.float32)
    cb = jnp.asarray(coords_bad)
    lb = jnp.full((n_cells,), float(lev_d), dtype=jnp.float32)

    def loop_d(c0, l0, *a):
        def body(s):
            i, c, acc = s
            out = core(c, l0, *a)
            return i + 1, c + out[0, 0] * 0.0, acc + out[:, 0].sum()
        def cond(s):
            return s[0] < n_iter
        return jax.lax.while_loop(cond, body, (0, c0, 0.0))

    fnd = jax.jit(loop_d)
    r = fnd(cb, lb, *args)
    float(jax.device_get(r[2]))
    t0 = time.perf_counter()
    r = fnd(cb + r[2] * 0.0, lb, *args)
    float(jax.device_get(r[2]))
    td = (time.perf_counter() - t0) / n_iter
    # how many queries actually went bad / stayed bad
    out = jax.jit(lambda c, l, *a: core(c, l, *a))(cb, lb, *args)
    nbad = int(jax.device_get((out[:, 3] > 0.5).sum()))
    print(f"D while_loop (surface cells, ring fires): {td * 1e3:7.1f} ms/iter"
          f"  residual-bad cells {nbad}/{n_cells}")

    # C: while_loop with cap-sized scatter-updated state feeding queries
    cap = 524288
    big_c = jnp.zeros((cap + 1, d), dtype=jnp.int32)
    big_g = jnp.zeros((cap + 1,), dtype=jnp.float32)

    def loop_c(c0, l0, bc, bg, *a):
        def body(s):
            i, bc, bg, acc = s
            rows = (jnp.arange(n_cells) + i * n_cells) % cap
            cc = bc[rows].astype(jnp.float32) + c0
            out = core(cc, l0, *a)
            bc = bc.at[rows].set(cc.astype(jnp.int32))
            bg = bg.at[rows].set(out[:, 0])
            return i + 1, bc, bg, acc + out[:, 0].sum()
        def cond(s):
            return s[0] < n_iter
        return jax.lax.while_loop(cond, body, (0, bc, bg, 0.0))

    fnc = jax.jit(loop_c)
    r = fnc(coords_j, level_j, big_c, big_g, *args)
    float(jax.device_get(r[3]))
    t0 = time.perf_counter()
    r = fnc(coords_j + r[3] * 0.0, level_j, big_c, big_g, *args)
    float(jax.device_get(r[3]))
    tc = (time.perf_counter() - t0) / n_iter
    print(f"C while_loop (cap-state scatters): {tc * 1e3:7.1f} ms/iter")

    extra(tree, core, args, cb, lb, n_iter)


def extra(tree, core, args, cb, lb, n_iter):
    """E: variant D with the core call inside a lax.cond, like the real
    device-loop body (guard -> no_iter/do_iter)."""
    import jax
    import jax.numpy as jnp
    import time

    def loop_e(c0, l0, *a):
        def body(s):
            i, c, acc = s

            def do_iter(op):
                c2, acc2 = op
                out = core(c2, l0, *a)
                return c2 + out[0, 0] * 0.0, acc2 + out[:, 0].sum()

            def no_iter(op):
                return op

            c, acc = jax.lax.cond(i < 2 * n_iter, do_iter, no_iter,
                                  (c, acc))
            return i + 1, c, acc

        def cond(s):
            return s[0] < n_iter
        return jax.lax.while_loop(cond, body, (0, c0, 0.0))

    fne = jax.jit(loop_e)
    r = fne(cb, lb, *args)
    float(jax.device_get(r[2]))
    t0 = time.perf_counter()
    r = fne(cb + r[2] * 0.0, lb, *args)
    float(jax.device_get(r[2]))
    te = (time.perf_counter() - t0) / n_iter
    print(f"E while_loop (core inside lax.cond): {te * 1e3:7.1f} ms/iter")


if __name__ == "__main__":
    main()

"""A/B the STL inside-test at bench scale (51k triangles): exact-broadcast
sweeps at several chunk sizes vs the two-level fast-winding path, on an
epoch-like corner batch (surface-clustered, most corners in the near band).
Chained timing, one sync."""
import os
import sys
import time
import tempfile

import numpy as np

sys.argv = ["x"]


def chain(fn, args, n=10):
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    feed = jnp.sum(out.astype(jnp.float32)) * 0.0
    float(jax.device_get(feed))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(args[0] + feed, *args[1:])
        feed = jnp.sum(out.astype(jnp.float32)) * 0.0
    float(jax.device_get(feed))
    return (time.perf_counter() - t0) / n


def main():
    import jax.numpy as jnp
    from bench import synthetic_sphere_stl
    from sparsespatialsampling_tpu.geometry import stl as S

    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "s.stl")
    synthetic_sphere_stl(p)

    # epoch-like corners: cells at level 8-9 hugging the sphere surface
    rng = np.random.default_rng(0)
    nrm = rng.normal(size=(16384, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    r = rng.uniform(0.046, 0.054, size=(16384, 1))
    pts = (np.asarray([0.2, 0.2, 0.2]) + nrm * r).astype(np.float32)
    pts_j = jnp.asarray(pts)

    geo = S.GeometrySTL3D("s", False, p)
    sgst = (geo._sg["state"], geo._sg["origin"], geo._sg["inv_h"],
            geo._sg["dims"])
    state = np.asarray(geo._sg["state"])
    dims = np.asarray(geo._sg["dims"]); org = np.asarray(geo._sg["origin"])
    cc = np.clip(np.floor((pts - org) * float(geo._sg["inv_h"])).astype(int),
                 0, dims - 1)
    flat = (cc[:, 0] * dims[1] + cc[:, 1]) * dims[2] + cc[:, 2]
    print(f"near-band corners: {(state[flat] == 2).sum()} / {len(pts)}")

    for chunk in (4096, 2048, 1024, 512):
        fn = S._make_sign_mask_fn(False, chunk)
        t = chain(lambda q, *a: fn(q, *a), (pts_j,) + sgst + geo._exact_args)
        print(f"exact-broadcast chunk={chunk}: {t*1e3:.1f} ms / 16.4k corners")

    fw = S.build_fast_winding(geo._triangles)
    fw_args = (fw["cell_tris"], fw["v0"], fw["v1"], fw["v2"], fw["resid"],
               fw["clus_cell"], fw["clus_cent"], fw["clus_an"], fw["origin"],
               fw["inv_h"], fw["dims"])
    for chunk in (4096, 2048, 1024):
        fn = S._make_sign_mask_fn(True, chunk)
        t = chain(lambda q, *a: fn(q, *a), (pts_j,) + sgst + fw_args)
        print(f"fast-winding    chunk={chunk}: {t*1e3:.1f} ms / 16.4k corners")

    # correctness cross-check: fw vs exact on these corners
    fn_e = S._make_sign_mask_fn(False, 4096)
    fn_f = S._make_sign_mask_fn(True, 1024)
    a = np.asarray(fn_e(pts_j, *sgst, *geo._exact_args))
    b = np.asarray(fn_f(pts_j, *sgst, *fw_args))
    print(f"fw vs exact disagreements: {(a != b).sum()} / {len(pts)}")


if __name__ == "__main__":
    main()

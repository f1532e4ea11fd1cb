"""Distributed randomized SVD: snapshot matrix sharded over the cell axis.

Tall-skinny rSVD (Halko-Martinsson-Tropp) where the ``[m, n]`` matrix is
row-sharded across the mesh.  The per-device work is MXU matmuls on the
local row block; cross-device communication is only ``psum`` of ``[l, l]``
Gram matrices and ``[l, n]`` projections — O(l²·n_dev) bytes over ICI,
independent of the (huge) row count.  Orthogonalization is Gram-based
(two rounds, like CholeskyQR2) but uses a rank-revealing eigh whitening
instead of a Cholesky factor: when the sketch is numerically rank-deficient
the float32 Gram matrix can be indefinite up to rounding, where Cholesky
silently yields NaN — eigh with a relative eigenvalue floor zeroes the dead
directions instead.

This is the scale-out path for the 100M-cell configs in BASELINE.json;
single-chip cases use ``ops/svd.py``.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .mesh import CELL_AXIS, pad_to_multiple


def _gram_whiten(y, axis_name):
    """One Gram-whitening step on a row-sharded ``y``: q = y · V diag(λ^-½) Vᵀ
    with an eigenvalue floor relative to λ_max; dead directions map to zero
    columns (dropped later by the small SVD's truncation)."""
    gram = jax.lax.psum(
        jnp.dot(y.T, y, preferred_element_type=jnp.float32), axis_name)
    lam, v = jnp.linalg.eigh(gram)
    floor = 1e-10 * jnp.maximum(lam[-1], 1e-30)
    inv_sqrt = jnp.where(lam > floor, jax.lax.rsqrt(jnp.maximum(lam, floor)), 0.0)
    return jnp.dot(y, v * inv_sqrt[None, :],
                   preferred_element_type=jnp.float32) @ v.T


def _gram_whiten2(y, axis_name):
    """Two whitening rounds for float32-stable orthogonality (the CholeskyQR2
    pattern with the NaN-free factorization)."""
    return _gram_whiten(_gram_whiten(y, axis_name), axis_name), None


def distributed_rsvd(a, rank: int, mesh: Mesh, n_oversample: int = 10,
                     n_iter: int = 2, seed: int = 0):
    """Randomized thin SVD of a row-sharded matrix.

    :param a: ``[m, n]`` matrix (host numpy; rows are sharded onto the mesh)
    :param rank: target rank
    :param mesh: 1-D device mesh with axis ``"cells"``
    :return: ``(U [m, rank], s [rank], V [n, rank])`` numpy arrays
    """
    a = np.asarray(a, dtype=np.float32)
    m, n = a.shape
    n_dev = mesh.devices.size
    l = min(rank + n_oversample, n)
    a_pad = pad_to_multiple(a, n_dev)

    @partial(shard_map, mesh=mesh, in_specs=(P(CELL_AXIS), P()),
             out_specs=(P(CELL_AXIS), P(), P()))
    def kernel(a_local, omega):
        y = jnp.dot(a_local, omega, preferred_element_type=jnp.float32)
        q, _ = _gram_whiten2(y, CELL_AXIS)
        for _ in range(n_iter):
            # power iteration: z = Aᵀ q (psum over row shards), y = A z
            z = jax.lax.psum(
                jnp.dot(a_local.T, q, preferred_element_type=jnp.float32),
                CELL_AXIS)
            z, _ = jnp.linalg.qr(z)  # [n, l] replicated — local QR
            y = jnp.dot(a_local, z, preferred_element_type=jnp.float32)
            q, _ = _gram_whiten2(y, CELL_AXIS)
        # b = qᵀ a : [l, n], psum over row shards
        b = jax.lax.psum(
            jnp.dot(q.T, a_local, preferred_element_type=jnp.float32),
            CELL_AXIS)
        ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
        u_local = jnp.dot(q, ub, preferred_element_type=jnp.float32)
        return u_local, s, vt

    key = jax.random.PRNGKey(seed)
    omega = jax.random.normal(key, (n, l), dtype=jnp.float32)
    u, s, vt = jax.jit(kernel)(jnp.asarray(a_pad), omega)
    u = np.asarray(u)[:m, :rank]
    return u, np.asarray(s)[:rank], np.asarray(vt)[:rank].T

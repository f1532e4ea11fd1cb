"""Device-resident SVD primitives for the S³ analysis pipeline.

Replaces the flowtorch ``SVD`` dependency of the reference
(``sparseSpatialSampling/utils.py:302-346``) with two TPU paths:

- :func:`economy_svd` — exact thin SVD via ``jnp.linalg.svd`` for
  reference-scale matrices (up to a few hundred thousand rows).
- :func:`randomized_svd` — Halko-Martinsson-Tropp randomized range finder
  for tall-skinny matrices: the heavy work is two MXU matmuls
  ``A @ Ω`` / ``Aᵀ @ Q`` plus a small host-side SVD, which also shards
  naturally over the cell axis (see ``parallel/svd.py``).

Rank selection without an explicit ``rank`` follows the Gavish-Donoho
optimal hard threshold for singular values (the same criterion flowtorch's
``opt_rank`` uses), computed from the published ω(β) approximation.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def optimal_rank(s: np.ndarray, shape) -> int:
    """Gavish-Donoho optimal hard threshold rank for a noisy matrix.

    ω(β) ≈ 0.56 β³ − 0.95 β² + 1.82 β + 1.43 with β = n/m (m ≥ n);
    keep singular values above ω·median(s).  At least one mode is kept.
    """
    m, n = max(shape), min(shape)
    beta = n / m
    omega = 0.56 * beta ** 3 - 0.95 * beta ** 2 + 1.82 * beta + 1.43
    tau = omega * np.median(s)
    return max(int((s > tau).sum()), 1)


def frobenius_sq(a: np.ndarray, chunk: int = 65536) -> float:
    """``‖a‖_F²`` accumulated in float64 (row-chunked; no full f64 copy).

    The sketched-rank criterion subtracts the sketch energy from this —
    the tail can be orders of magnitude smaller than the total, so f32
    accumulation error would swamp it."""
    total = 0.0
    for lo in range(0, a.shape[0], chunk):
        blk = a[lo:lo + chunk].astype(np.float64, copy=False)
        total += float(np.square(blk).sum())
    return total


def optimal_rank_sketched(s: np.ndarray, shape, fro_norm_sq: float) -> int:
    """Gavish-Donoho rank from a TRUNCATED spectrum (randomized-SVD sketch).

    The criterion needs the median of the *full* spectrum, but a sketch only
    carries the top ``l`` values — their median overestimates the noise
    floor and biases the rank low.  The unseen tail is reconstructed from
    energy conservation: ``Σ_tail s² = ‖A‖_F² − Σ_sketch s²``, modeled as a
    flat noise floor ``s_tail = sqrt(tail_energy / (n_total − l))``.  When
    the true median falls inside the tail, that floor IS the median
    estimate; otherwise the sketch median is used directly.
    """
    m, n = max(shape), min(shape)
    l = s.shape[0]
    if l >= n:  # sketch covers the whole spectrum — exact criterion
        return optimal_rank(s, shape)
    beta = n / m
    omega = 0.56 * beta ** 3 - 0.95 * beta ** 2 + 1.82 * beta + 1.43
    tail_energy = max(float(fro_norm_sq) - float(np.square(s).sum()), 0.0)
    tail_rms = np.sqrt(tail_energy / max(n - l, 1))
    if l > n // 2:
        median = float(np.sort(s)[l - 1 - n // 2])  # (n//2)-th largest
    else:
        median = float(tail_rms)
    tau = omega * median
    return max(int((s > tau).sum()), 1)


@jax.jit
def _svd_device(a):
    return jnp.linalg.svd(a, full_matrices=False)


def _tall_skinny_svd(a: np.ndarray, max_rank: int = None) -> tuple:
    """Exact thin SVD of a tall-skinny matrix via the float64 snapshot
    method (Gram matrix + eigendecomposition) on the host.

    Deliberately NOT a device path: the heavy work is two O(m·n²) gemms
    with tiny n (~1.5 GFLOP for the [150k, 50] S³ snapshot shape, ~0.3 s),
    while every device alternative measured far worse end-to-end on this
    TPU (``jnp.linalg.svd`` ~4 s; ``jnp.linalg.qr`` ~100 s — it lowers to
    a long sequence of tiny kernels), and the result must cross the
    ~35 MB/s tunnel readback regardless.  Host LAPACK QR would avoid the
    Gram squaring but runs at BLAS-2 speed here (~5 s); in float64 the
    squaring is harmless — singular values resolve down to ~√(eps·√m)·σ₁ ≈
    3e-7·σ₁, far below the f32 input data's own precision.

    The Gram product accumulates in f64 over row blocks through one
    reusable buffer — the full ``m×n`` f64 copy it replaces cost more in
    page faults than the dgemm itself on this box.  ``s`` always carries
    the FULL spectrum (rank selection needs it); with ``max_rank`` only
    that many mode/V columns are materialized — the tall sgemm output is
    the other memory-bound term, and callers with an explicit rank (the
    usual export path) don't pay for modes they discard."""
    m, n = a.shape
    gram = np.zeros((n, n), dtype=np.float64)
    chunk = 65536
    buf = np.empty((min(chunk, m), n), dtype=np.float64)
    for lo in range(0, m, chunk):
        h = min(chunk, m - lo)
        buf[:h] = a[lo:lo + h]                # casts f32→f64 in place
        gram += buf[:h].T @ buf[:h]
    lam, v = np.linalg.eigh(gram)
    lam, v = lam[::-1], v[:, ::-1]            # descending
    s = np.sqrt(np.maximum(lam, 0.0))
    floor = np.finfo(np.float64).eps ** 0.5 * max(s[0], 1e-300)
    inv = np.where(s > floor, 1.0 / np.maximum(s, floor), 0.0)
    cols = n if max_rank is None else max(min(int(max_rank), n), 1)
    # the mode matmul runs in f32 (this host's BLAS is memory-bound on the
    # tall output; sgemm halves the traffic and skips the f64→f32 cast) —
    # s and V keep full f64 accuracy from the Gram path above
    u = a @ (v[:, :cols] * inv[None, :cols]).astype(np.float32)
    return u, s.astype(np.float32), v[:, :cols].astype(np.float32)


def economy_svd(a, max_rank: int = None) -> tuple:
    """Exact thin SVD ``a = U diag(s) Vᵀ``; returns numpy ``(U, s, V)``
    with V the right singular vectors as columns (``V[:, i]``).

    ``s`` always carries the full spectrum; with ``max_rank`` only that
    many U/V columns are materialized (tall-skinny path — the spectrum is
    free there, the tall mode gemm is not).

    Tall-skinny matrices (the S³ snapshot shape: many cells, few snapshots)
    route through the host Gram/snapshot path — f64 ``aᵀa`` + ``eigh`` + one
    sgemm for the modes (see :func:`_tall_skinny_svd`); squarish
    ones use the XLA SVD with the row axis zero-padded to a power of two —
    appended zero rows change neither the singular values nor V, and bound
    the number of distinct compiled shapes across runs."""
    a = np.asarray(a, dtype=np.float32)
    m, n = a.shape
    if m >= 8 * n and m >= 4096 and m * n * n <= 1e11:
        return _tall_skinny_svd(a, max_rank)
    if m > n:
        m_pad = max(256, 1 << int(m - 1).bit_length())
        if m_pad != m:
            a = np.concatenate([a, np.zeros((m_pad - m, n), dtype=a.dtype)])
    u, s, vt = _svd_device(jnp.asarray(a))
    return np.asarray(u)[:m], np.asarray(s), np.asarray(vt).T


@partial(jax.jit, static_argnames=("rank", "n_oversample", "n_iter"))
def _rsvd_device(a, key, rank: int, n_oversample: int, n_iter: int):
    """Randomized range finder + small SVD, all on device.

    ``a [m, n]`` tall-skinny; sketch width ``l = rank + n_oversample``.
    Power iterations with QR re-orthogonalization for spectral accuracy.
    """
    m, n = a.shape
    l = min(rank + n_oversample, n)
    omega = jax.random.normal(key, (n, l), dtype=a.dtype)
    y = a @ omega                               # [m, l]  MXU
    q, _ = jnp.linalg.qr(y)
    for _ in range(n_iter):
        z = a.T @ q                             # [n, l]  MXU
        z, _ = jnp.linalg.qr(z)
        y = a @ z
        q, _ = jnp.linalg.qr(y)
    b = q.T @ a                                 # [l, n]
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = q @ ub
    return u[:, :rank], s[:rank], vt[:rank]


def randomized_svd(a, rank: int, n_oversample: int = 10, n_iter: int = 2,
                   seed: int = 0) -> tuple:
    """Randomized thin SVD of rank ``rank``; returns numpy ``(U, s, V)``."""
    a = jnp.asarray(a, dtype=jnp.float32)
    key = jax.random.PRNGKey(seed)
    u, s, vt = _rsvd_device(a, key, int(rank), int(n_oversample), int(n_iter))
    return np.asarray(u), np.asarray(s), np.asarray(vt).T

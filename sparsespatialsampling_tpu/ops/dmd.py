"""Exact Dynamic Mode Decomposition on device.

The reference's DMD analysis (``post_processing/compare_dmd_OAT.py:17``)
depends on flowtorch; here exact DMD (Tu et al. 2014) is built directly on
the TPU SVD primitives so the full S³ analysis pipeline is self-contained:

    X ≈ U Σ V*        (thin SVD of the first n-1 snapshots)
    Ã = U* X' V Σ⁻¹   (reduced linear operator, [r, r])
    Ã W = W Λ         (host eigendecomposition — r is small)
    Φ = X' V Σ⁻¹ W    (exact DMD modes)

The heavy work (SVD + the two projections) is MXU matmuls; only the tiny
``[r, r]`` eigenproblem runs on host (complex eig is not TPU-friendly).
"""
import numpy as np
import jax.numpy as jnp

from .svd import economy_svd, optimal_rank


def exact_dmd(data: np.ndarray, dt: float = 1.0, rank: int = None):
    """Exact DMD of a snapshot matrix ``[n_points, n_snapshots]``.

    :param data: snapshot matrix; columns are consecutive time steps
    :param dt: time-step size between snapshots (for frequencies/growth rates)
    :param rank: truncation rank; None → Gavish-Donoho optimal rank
    :return: dict with ``eigenvalues`` (discrete, complex), ``modes``
        ``[n_points, r]`` (complex), ``frequencies`` [Hz], ``growth_rates``,
        ``amplitudes`` (complex, least-squares fit to the first snapshot)
    """
    data = np.asarray(data, dtype=np.float32)
    x, x_prime = data[:, :-1], data[:, 1:]

    u, s, v = economy_svd(x)
    if rank is None:
        rank = optimal_rank(s, x.shape)
    # clamp to the numerical rank: Σ⁻¹ on near-zero singular values would
    # blow up the reduced operator
    num_rank = int((s > max(s[0], 1e-30) * 1e-6).sum())
    rank = int(min(rank, s.shape[0], max(num_rank, 1)))
    u, s, v = u[:, :rank], s[:rank], v[:, :rank]

    # reduced operator on device: [r, n]·[n, r] matmuls
    a_tilde = np.asarray(
        jnp.einsum("nr,nm,mq,q->rq", jnp.asarray(u), jnp.asarray(x_prime),
                   jnp.asarray(v), jnp.asarray(1.0 / s)))

    eigvals, w = np.linalg.eig(a_tilde)

    # exact modes: Φ = X' V Σ⁻¹ W
    proj = np.asarray(jnp.asarray(x_prime) @ (jnp.asarray(v) * (1.0 / s)))
    modes = proj @ w

    # continuous-time quantities; eig returns a real array when every
    # eigenvalue is real — cast so log(negative) lands on the complex branch
    # instead of NaN
    log_ev = np.log(np.where(eigvals == 0, 1e-30, eigvals).astype(np.complex128))
    frequencies = log_ev.imag / (2 * np.pi * dt)
    growth_rates = log_ev.real / dt

    # amplitudes: least-squares fit of the modes to the first snapshot
    amplitudes, *_ = np.linalg.lstsq(modes, data[:, 0].astype(np.complex128),
                                     rcond=None)

    return {"eigenvalues": eigvals, "modes": modes, "frequencies": frequencies,
            "growth_rates": growth_rates, "amplitudes": amplitudes,
            "rank": rank}

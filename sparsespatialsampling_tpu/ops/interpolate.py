"""Batched inverse-distance interpolation of snapshot data onto the S³ grid.

Replaces the reference's chunked CPU gather (``interpolate_data``,
``sparseSpatialSampling/export.py:446-468``): ``out[i] = Σ_k w[i,k] ·
data[idx[i,k]]``.  On TPU this is a fused gather + contraction that XLA
lowers to vectorized HBM loads and a VPU multiply-accumulate; all snapshots
and components of a chunk are interpolated in one device call instead of the
reference's per-chunk Python loop.

The public entry point keeps the reference's cell-chunking so peak memory is
``chunk_size × k × n_comp × n_snapshots`` regardless of grid size.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .transfer import packed_readback


@partial(jax.jit, donate_argnums=())
def _interp_chunk(weights, idx, data):
    """``weights [M, k]``, ``idx [M, k]`` int32, ``data [N, C, S]`` →
    ``out [M, C, S]``."""
    gathered = data[idx]  # [M, k, C, S]
    return jnp.einsum("mk,mkcs->mcs", weights, gathered)


def _auto_chunk(k: int, n_comp: int, n_snap: int,
                budget_bytes: float = 1.5e9) -> int:
    """Largest per-call query count whose gather temporary ``[Q, k, C, S]``
    stays within ``budget_bytes`` (the TPU here is a 16 GB v5e)."""
    per_query = max(k * n_comp * n_snap * 4, 1)
    return max(1024, int(budget_bytes / per_query))


def interpolate_data(weights, idx, data, chunk_size: int = None) -> np.ndarray:
    """Inverse-distance-weighted interpolation of field data onto query points.

    :param weights: ``[M, k]`` normalized per-row interpolation weights
    :param idx: ``[M, k]`` neighbor indices into the original grid
    :param data: ``[N_orig, C, S]`` original field data (C components,
        S snapshots); scalar fields use C = 1
    :param chunk_size: number of query points interpolated per device call;
        default (None) picks the largest chunk whose gather temporary fits
        device memory — fewer round trips beat smaller footprints here
    :return: ``[M, C, S]`` interpolated data (numpy, float32)
    """
    weights = np.asarray(weights, dtype=np.float32)
    idx = np.asarray(idx, dtype=np.int32)
    if not isinstance(data, jax.Array):
        data = jnp.asarray(np.asarray(data), dtype=jnp.float32)
    elif data.dtype != jnp.float32:
        data = data.astype(jnp.float32)
    m = weights.shape[0]
    if chunk_size is None:
        chunk_size = _auto_chunk(weights.shape[1], data.shape[1],
                                 data.shape[2])
    chunk_size = int(chunk_size)

    def run(w_np, i_np):
        # pow2-pad the query axis: bounds distinct compiled shapes to
        # O(log M) across runs with varying grid sizes
        n = w_np.shape[0]
        n_pad = max(256, 1 << int(n - 1).bit_length()) if n > 1 else 256
        w_p = np.zeros((n_pad, w_np.shape[1]), dtype=np.float32)
        w_p[:n] = w_np
        i_p = np.zeros((n_pad, i_np.shape[1]), dtype=np.int32)
        i_p[:n] = i_np
        return np.asarray(_interp_chunk(jnp.asarray(w_p), jnp.asarray(i_p), data))[:n]

    if m <= chunk_size:
        return run(weights, idx)

    out = np.empty((m,) + data.shape[1:], dtype=np.float32)
    for lo in range(0, m, chunk_size):
        hi = min(lo + chunk_size, m)
        out[lo:hi] = run(weights[lo:hi], idx[lo:hi])
    return out


def build_host_operator(w, idx, n_src: int):
    """Pack a ``[Q, k]`` weight cache into a scipy CSR matrix ``(Q, n_src)``
    so every host interpolation is ONE sparse matmul.

    The CSR values keep the neighbor (ascending-distance) order within each
    row, so the f32 accumulation order — and therefore the result, to the
    bit — matches the chunked ``einsum`` this replaces; scipy's C kernel is
    ~2x faster than numpy's fancy-index gather + contraction on this host
    and the pack cost (~10 ms at 151k x 26, plus scipy's one-time import)
    amortizes across all fields and snapshot batches of an export."""
    import scipy.sparse as sp  # deferred: scipy optional for device-only use
    w = np.asarray(w, dtype=np.float32)
    idx = np.asarray(idx, dtype=np.int64)
    q, k = w.shape
    indptr = np.arange(q + 1, dtype=np.int64) * k
    return sp.csr_matrix((w.ravel(), idx.ravel(), indptr), shape=(q, n_src))


def build_host_weight_cache(knn_index, points, k: int):
    """The export path's HOST weight cache for one point set: kNN inverse-
    distance weights + neighbor indices + the CSR contraction operator.

    Single source of truth for ``ExportData._build_knn_cache``'s host
    branch AND the post-refinement prefetch thread
    (``execute_grid_generation``) — both must build byte-identical caches
    or the prefetched one would silently diverge from the fallback build.
    Returns ``(w [Q, k] f32, idx [Q, k], csr_op, n_fallback)``."""
    w, idx = knn_index.weights(points, k)
    w = np.asarray(w)
    idx = np.asarray(idx)
    op = build_host_operator(w, idx, knn_index.n_points)
    return w, idx, op, int(getattr(knn_index, "last_fallback", 0))


def interpolate_host(w, idx, data, chunk_size: int = 16384,
                     timings: dict = None, op=None) -> np.ndarray:
    """Pure-host contraction on NUMPY weight caches (one CSR matmul).

    Rationale (this deployment's measured numbers): the interpolation is a
    trivial memory-bound contraction, but the snapshot matrix starts on the
    host and the result must return to the host for the HDF5 write.  When
    the device link is a tunnel (2–88 MB/s observed), the device path moves
    ``data`` up (~100 MB for cylinder3D) plus the result back (~30 MB) per
    field, while the host path moves the ``[Q, k]`` weight cache down ONCE
    (~31 MB) and nothing else — a 4x traffic cut that also amortizes over
    fields and batches.  The k-NN search (the hard part) still runs on the
    device.  Force the device path with ``S3_TPU_INTERP=device`` (on
    co-located hardware its PCIe upload is negligible and it wins).

    :param op: optional prebuilt :func:`build_host_operator` CSR matrix
        (cached by ``ExportData`` across fields/batches); built on the fly
        from ``w``/``idx`` when absent
    """
    from time import perf_counter
    t0 = perf_counter()
    data = np.asarray(data, dtype=np.float32)
    if op is None:
        op = build_host_operator(w, idx, data.shape[0])
    m, k = op.shape[0], np.asarray(w).shape[1]
    n = data.shape[0]
    out = (op @ data.reshape(n, -1)).reshape((m,) + data.shape[1:])
    if timings is not None:
        timings["t_kernel"] = (timings.get("t_kernel", 0.0)
                               + perf_counter() - t0)
        c_s = data.shape[1] * data.shape[2]
        timings["interp_bytes"] = (timings.get("interp_bytes", 0.0)
                                   + m * (k + 1) * c_s * 4.0)
        timings["interp_outputs"] = (timings.get("interp_outputs", 0)
                                     + m * c_s)
    return out


def interpolate_device(w_dev, idx_dev, data, n, chunk_size: int = None,
                       timings: dict = None):
    """Interpolation with device-resident weights (``KNNIndex.weights_device``
    output): no weight readback/re-upload round trip — only the original
    snapshots go up and the interpolated result comes back.

    :param w_dev: ``[Q_pad, k]`` jnp.float32 normalized weights
    :param idx_dev: ``[Q_pad, k]`` jnp.int32 indices into ``data``'s rows
    :param data: ``[N_orig, C, S]`` snapshot matrix — host array, or a
        jax Array already on device (``export.py`` device_puts it early so
        the upload overlaps the weight-cache build; converting it back
        through ``np.asarray`` here would force a full readback + re-upload
        through the tunnel, serializing exactly what the overlap hides)
    :param n: number of real query rows (rows ``n:`` are padding)
    :param timings: optional dict; accumulates ``t_kernel`` (dispatch +
        device compute, incl. any pending upload the kernel waits on) and
        ``t_readback`` (device→host transfer of the result) in seconds
    :return: ``[n, C, S]`` numpy float32
    """
    from time import perf_counter
    if not isinstance(data, jax.Array):
        data = jnp.asarray(np.asarray(data), dtype=jnp.float32)
    elif data.dtype != jnp.float32:
        data = data.astype(jnp.float32)
    q_pad = w_dev.shape[0]
    if chunk_size is None:
        chunk_size = _auto_chunk(w_dev.shape[1], data.shape[1], data.shape[2])
    chunk_size = max(256, 1 << (int(chunk_size).bit_length() - 1))
    t0 = perf_counter()
    outs = [_interp_chunk(w_dev[lo:lo + chunk_size],
                          idx_dev[lo:lo + chunk_size], data)
            for lo in range(0, q_pad, chunk_size)] if q_pad > chunk_size \
        else [_interp_chunk(w_dev, idx_dev, data)]
    # ``block_until_ready`` does not reliably sync through the axon tunnel
    # (timings would misattribute kernel time to the readback) — chain a
    # scalar data dependency over every chunk and device_get it instead
    jax.device_get(jnp.stack([o.ravel()[0] for o in outs]).sum())
    t1 = perf_counter()
    out = np.empty((q_pad,) + data.shape[1:], dtype=np.float32)
    lo = 0
    for o in packed_readback(outs):   # ONE device→host transfer
        out[lo:lo + o.shape[0]] = o
        lo += o.shape[0]
    t2 = perf_counter()
    if timings is not None:
        timings["t_kernel"] = timings.get("t_kernel", 0.0) + (t1 - t0)
        timings["t_readback"] = timings.get("t_readback", 0.0) + (t2 - t1)
        # throughput accounting: the kernel's HBM traffic is the k-way
        # value gather [Q, k, C, S] plus the [Q, C, S] result write; the
        # outputs count feeds cells·snapshots/s in bench.py
        c_s = data.shape[1] * data.shape[2]
        k = w_dev.shape[1]
        timings["interp_bytes"] = (timings.get("interp_bytes", 0.0)
                                   + q_pad * (k + 1) * c_s * 4.0)
        timings["interp_outputs"] = (timings.get("interp_outputs", 0)
                                     + n * c_s)
    return out[:n]

"""One-transfer device→host readbacks with bounded compiled-shape counts.

Each separate ``np.asarray(device_buf)`` pays a full tunnel round trip
(~36-56 ms healthy), so chunked kernels stage every chunk's output into
ONE device buffer and read it back in a single transfer.  A naive
``jnp.concatenate(chunks)`` achieves the single transfer but bakes the
chunk COUNT into the compiled program signature — every distinct count is
a fresh remote compile (1-40 s cold through the tunnel), defeating the
repo's O(log N) compiled-shapes discipline.  Staging through a flat
pow2-sized buffer with one fixed-signature write per chunk bounds the
distinct compiled programs at O(log total · log chunk-bucket),
independent of how many chunks a sweep dispatches.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["packed_readback"]


@jax.jit
def _flat_write(buf, chunk, off):
    """Write ``chunk`` (any shape) flattened into ``buf`` at ``off``.

    ``off`` is a traced scalar, so the compiled signature depends only on
    ``(buf.size, chunk.shape, dtype)`` — both pow2-bucketed by the callers.
    """
    return jax.lax.dynamic_update_slice(buf, chunk.reshape(-1), (off,))


def packed_readback(bufs):
    """Host copies of same-dtype device arrays in ONE device→host transfer.

    :param bufs: non-empty list of jax arrays sharing one dtype (shapes may
        differ; callers keep them bucket-padded so the per-chunk write
        signatures stay O(log) per call site)
    :return: list of ``np.ndarray`` with the same shapes and dtype
    """
    if len(bufs) == 1:
        return [np.asarray(bufs[0])]
    sizes = [int(np.prod(b.shape)) for b in bufs]
    total = sum(sizes)
    cap = max(1, 1 << (total - 1).bit_length())
    acc = jnp.zeros(cap, dtype=bufs[0].dtype)
    off = 0
    for b, sz in zip(bufs, sizes):
        acc = _flat_write(acc, b, np.int32(off))
        off += sz
    host = np.asarray(acc)
    outs, off = [], 0
    for b, sz in zip(bufs, sizes):
        outs.append(host[off:off + sz].reshape(b.shape))
        off += sz
    return outs

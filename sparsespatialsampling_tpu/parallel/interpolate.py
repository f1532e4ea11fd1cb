"""Multi-chip snapshot interpolation: query cells sharded over the mesh.

Each device interpolates its shard of the S³ cells — a pure gather +
contraction against the (replicated) snapshot matrix — with zero
collectives in the hot path.  This is the scale-out version of
``ops/interpolate.py`` for grids too large for one chip's HBM-bandwidth
budget.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .mesh import CELL_AXIS, pad_to_multiple


def sharded_interpolate(weights, idx, data, mesh: Mesh) -> np.ndarray:
    """Inverse-distance interpolation with the query axis sharded.

    :param weights: ``[M, k]`` per-row-normalized weights
    :param idx: ``[M, k]`` neighbor indices into ``data``
    :param data: ``[N_orig, C, S]`` snapshot matrix (replicated)
    :param mesh: 1-D device mesh with axis ``"cells"``
    :return: ``[M, C, S]`` interpolated values (numpy)
    """
    n_dev = mesh.devices.size
    m = weights.shape[0]
    w = pad_to_multiple(np.asarray(weights, dtype=np.float32), n_dev)
    ix = pad_to_multiple(np.asarray(idx, dtype=np.int32), n_dev)

    def kernel(w_local, idx_local, data_rep):
        gathered = data_rep[idx_local]  # [m_local, k, C, S]
        return jnp.einsum("mk,mkcs->mcs", w_local, gathered)

    fn = jax.jit(shard_map(
        kernel, mesh=mesh,
        in_specs=(P(CELL_AXIS), P(CELL_AXIS), P()),
        out_specs=P(CELL_AXIS)))
    out = fn(jnp.asarray(w), jnp.asarray(ix),
             jnp.asarray(np.asarray(data), dtype=jnp.float32))
    return np.asarray(out)[:m]

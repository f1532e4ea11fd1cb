"""Pallas TPU kernel: k smallest values per row with canonical ties.

``lax.top_k`` on the [36.8k, 864] epoch-selection shape costs ~12.8 ms on
the v5e — it lowers to a general sorting network, while this workload only
needs the k=26 smallest of 864 with *first-occurrence* (lowest-slot) tie
resolution, which on the index-sorted dilated rows IS the canonical
ascending ``(distance², index)`` order.  Iterative min-extraction in VMEM
does that exactly: per pass one min-reduce, one first-argmin (min over a
masked iota), one masked invalidation — ~4 elementwise sweeps of the block
per extracted neighbor, VPU-bound, measured ~4x faster than ``top_k`` at
the epoch shape.

Values are the INPUT values bit-for-bit (no repacking), so the selection
is safe for the bitwise grid-vs-full-scan equivalence contract — unlike
``lax.approx_max_k``, which perturbs returned values by up to 3 ulp.

The kernel is TPU-only at runtime (CPU tests exercise it through the
Pallas interpreter at small shapes; the production CPU path keeps
``lax.top_k``, which implements the identical semantics).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _topk_small_kernel(x_ref, vals_ref, sel_ref, *, k: int):
    x = x_ref[...]                                        # [B, W] f32
    b, w = x.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    inf = jnp.float32(jnp.inf)

    def body(j, carry):
        # per-lane dynamic stores are not Mosaic-friendly — accumulate the
        # [B, k] outputs as loop-carried vectors via iota selects instead
        x, vals, sels = carry
        m = jnp.min(x, axis=1)                            # [B]
        hit = x == m[:, None]
        am = jnp.min(jnp.where(hit, iota, w), axis=1)     # first (lowest) slot
        vals = jnp.where(lane == j, m[:, None], vals)
        sels = jnp.where(lane == j, am[:, None], sels)
        return (jnp.where(iota == am[:, None], inf, x), vals, sels)

    _, vals, sels = jax.lax.fori_loop(
        0, k, body,
        (x, jnp.zeros((b, k), x.dtype), jnp.zeros((b, k), jnp.int32)))
    vals_ref[...] = vals
    sel_ref[...] = sels


def _pick_block(q: int) -> int:
    for b in (256, 128, 64, 32, 16, 8):
        if q % b == 0:
            return b
    return 1


@partial(jax.jit, static_argnames=("k", "interpret"))
def topk_smallest(x, k: int, interpret: bool = False):
    """``(vals [Q, k], sel [Q, k] int32)`` — the k smallest of each row in
    ascending value order, ties resolved by ascending column index; values
    are returned bit-exactly.

    Caveat vs ``lax.top_k(-x)``: extraction invalidates a selected slot by
    writing ``+inf``, which is indistinguishable from a genuine ``+inf``
    input — a row with fewer than k finite entries therefore repeats its
    first-``inf`` slot in ``sel`` (with ``+inf`` vals) where ``top_k``
    would return distinct pad indices.  Callers must treat ``+inf`` values
    as invalid rather than rely on distinct ``sel``; the dilated kNN rows
    this serves never contain ``inf`` (pad candidates are clamped to a
    finite 1e15 squared distance), so the two formulations agree there."""
    q, w = x.shape
    b = _pick_block(q)
    kern = partial(_topk_small_kernel, k=k)
    vals, sel = pl.pallas_call(
        kern,
        grid=(q // b,),
        in_specs=[pl.BlockSpec((b, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((b, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((b, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((q, k), x.dtype),
                   jax.ShapeDtypeStruct((q, k), jnp.int32)),
        interpret=interpret,
    )(x)
    return vals, sel

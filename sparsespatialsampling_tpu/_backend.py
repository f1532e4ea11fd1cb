"""Array-namespace dispatch.

Geometry predicates are written against the shared numpy/jax.numpy API surface
so the same code runs as pure numpy for small host-side calls (single-cell
checks, tests) and as jax.numpy inside jitted batched validity kernels on TPU.
"""
import numpy as np
import jax
import jax.numpy as jnp


def array_namespace(x):
    """Return jnp for jax arrays / tracers, numpy otherwise."""
    return jnp if isinstance(x, jax.Array) else np

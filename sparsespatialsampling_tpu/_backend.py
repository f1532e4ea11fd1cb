"""Array-namespace dispatch + backend configuration.

Geometry predicates are written against the shared numpy/jax.numpy API surface
so the same code runs as pure numpy for small host-side calls (single-cell
checks, tests) and as jax.numpy inside jitted batched validity kernels on TPU.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

_CACHE_ENABLED = False


def enable_compilation_cache() -> None:
    """Persist compiled executables across processes.

    The refinement loop compiles a handful of power-of-two-bucketed shapes;
    over a remote TPU each compile costs 10-40 s, so caching them on disk
    makes every run after the first start hot.  Opt out with
    ``S3_TPU_NO_COMPILATION_CACHE=1`` or by pre-setting
    ``JAX_COMPILATION_CACHE_DIR``.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED or os.environ.get("S3_TPU_NO_COMPILATION_CACHE"):
        return
    # CPU-only processes skip the persistent cache: XLA:CPU serializes
    # AOT code for the exact host ISA but the cache key does NOT capture
    # the host machine features, so a cache dir shared across heterogeneous
    # hosts can load foreign AVX-flavored executables that mis-execute
    # (observed as an intermittent NaN from a cached QR kernel). The remote
    # compile cost the cache exists to amortize is TPU-only anyway.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    _CACHE_ENABLED = True
    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "s3_tpu_jax")
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except (OSError, AttributeError):
            return
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:
        pass


def array_namespace(x):
    """Return jnp for jax arrays / tracers, numpy otherwise."""
    return jnp if isinstance(x, jax.Array) else np


_JIT_CACHE = {}


def cached_jit(key, make):
    """Process-global cache of jitted callables.

    A fresh ``jax.jit`` object re-traces on first call and — even on a
    persistent-compile-cache hit — loads a NEW executable onto the device,
    which over the remote tunnel costs ~0.4 s per program (measured: a
    fresh ``BatchedValidity`` instance's first call is 0.47 s vs 0.04 s
    for a repeat call on the same instance).  Engine objects are rebuilt
    per run, so without sharing every run pays those loads again.

    ``key`` must cover every value the traced function bakes into the
    program as a constant (geometry content digests, static ints); shapes
    and dtypes of *arguments* are keyed by jax itself.  A key of ``None``
    (or containing ``None``) disables sharing and returns ``make()``
    directly — the safe fallback for objects without a content digest.
    """
    def _has_none(k):
        return k is None or (isinstance(k, tuple) and any(_has_none(x) for x in k))
    if _has_none(key):
        return make()
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = make()
    return fn

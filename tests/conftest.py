"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware is only used by ``bench.py``; tests exercise the same code
paths on CPU. The environment pre-registers the TPU plugin at interpreter
startup (sitecustomize) and pins ``JAX_PLATFORMS=axon``, so a plain env-var
default is not enough — the platform must be overridden through jax.config
before any backend is initialized.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# The pipeline auto-shards when >1 device is visible; the virtual mesh would
# route EVERY test through the sharded path. Default the suite to the
# single-chip path — tests/test_multichip_pipeline.py removes this per-test
# to cover the sharded path and compare it against single-chip results.
os.environ.setdefault("S3_TPU_DISABLE_SHARDING", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolate_knn_index_cache():
    """The engine's size-1 content-keyed k-NN index reuse is semantically
    invisible in production, but tests monkeypatch index class attributes
    (GRID_MIN_POINTS) — an index cached under one patch must not leak into
    a test expecting another build policy for the same cloud bytes."""
    from sparsespatialsampling_tpu.engine import tree
    tree._KNN_INDEX_CACHE.clear()
    yield
    tree._KNN_INDEX_CACHE.clear()

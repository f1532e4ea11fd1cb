"""Device-mesh construction for multi-chip S³ runs.

The reference's only parallelism is a single-node ``multiprocessing`` pool
(``sparseSpatialSampling/s_cube.py:159``, SURVEY.md §2.9) — there is no
distributed backend to mirror.  The TPU-native scale-out axis is the *cell*
axis (grid cells / CFD points) sharded over a 1-D ``jax.sharding.Mesh``:
geometry masking, k-NN queries, interpolation gathers, and the rSVD row
blocks are all embarrassingly parallel over cells, and the only collectives
are small ``psum``/``all_gather`` reductions that ride ICI.
"""
import os

import numpy as np
import jax
from jax.sharding import Mesh

CELL_AXIS = "cells"


def sharding_enabled() -> bool:
    """True when the pipeline should shard its hot paths over all local
    devices (k-NN epochs, interpolation, rSVD).

    Multi-device sharding is the default whenever more than one device is
    visible; set ``S3_TPU_DISABLE_SHARDING=1`` to force the single-chip code
    path (used by the test suite to cover both paths on the virtual mesh).
    """
    if os.environ.get("S3_TPU_DISABLE_SHARDING", "").lower() in ("1", "true", "yes"):
        return False
    return len(jax.devices()) > 1


def make_mesh(n_devices: int = None, axis_name: str = CELL_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def default_mesh() -> Mesh:
    return make_mesh()


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0,
                    fill=0.0) -> np.ndarray:
    """Pad ``x`` along ``axis`` so its size is a multiple of ``multiple``."""
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=fill)

"""Base class for geometry objects.

TPU-native re-design of the reference geometry contract
(``sparseSpatialSampling/geometry/geometry_base.py:16-222``): instead of a
scalar ``check_cell(cell_nodes) -> bool`` evaluated per-cell inside a
multiprocessing pool, every geometry here exposes a *vectorized* inside-test

    ``mask_points(points [M, d]) -> bool [M]``    (True = inside)

written in ``jax.numpy`` so the engine can evaluate the validity of *all*
candidate cells' corner nodes in a single jitted batched call per geometry.
The reference single-cell API (``check_cell``) is kept for drop-in
compatibility and for the test-suite truth tables.
"""
import logging
from abc import ABC, abstractmethod

import numpy as np
import jax.numpy as jnp

logger = logging.getLogger(__name__)


class GeometryObject(ABC):
    def __init__(self, name: str, keep_inside: bool, refine: bool = False,
                 min_refinement_level: int = None):
        """
        :param name: name of the geometry object
        :param keep_inside: if True, points inside the object are kept
            (the object represents the numerical domain); if False they are
            masked out (the object is an obstacle)
        :param refine: if True, the grid around the geometry surface is
            refined after the metric-based refinement
        :param min_refinement_level: target level for the geometry refinement;
            if None and ``refine=True`` the max level present at the surface
            is used
        """
        self._name = name
        self._keep_inside = keep_inside
        self._refine = refine
        self._min_refinement_level = min_refinement_level
        self._check_common_arguments()

    # ------------------------------------------------------------------ #
    # vectorized contract                                                 #
    # ------------------------------------------------------------------ #
    @abstractmethod
    def mask_points(self, points):
        """Vectorized inside-test.

        :param points: ``[M, d]`` array (jnp or np) of query points
        :return: bool ``[M]`` — True for points inside (or on the surface of)
            the geometry
        """

    def check_cells(self, cell_nodes, refine_geometry: bool = False):
        """Vectorized cell-validity test.

        :param cell_nodes: ``[M, n_nodes_per_cell, d]`` corner nodes of M cells
        :param refine_geometry: if False, decide invalidity for *removal*
            (geometry: all nodes inside; domain: no node inside). If True,
            decide *surface proximity* for geometry refinement (geometry: any
            node inside; domain: any node outside) — reference semantics
            ``geometry_base.py:40-76``.
        :return: bool ``[M]`` — True where the cell is invalid / near surface
        """
        m, n, d = cell_nodes.shape
        mask = self.mask_points(cell_nodes.reshape(m * n, d)).reshape(m, n)
        return apply_mask(mask, self._keep_inside, refine_geometry)

    # ------------------------------------------------------------------ #
    # reference-compatible single-cell API                                #
    # ------------------------------------------------------------------ #
    def check_cell(self, cell_nodes, refine_geometry: bool = False) -> bool:
        """Single-cell version of :meth:`check_cells` (reference drop-in)."""
        nodes = np.asarray(cell_nodes, dtype=np.float64)[None]
        return bool(np.asarray(self.check_cells(nodes, refine_geometry))[0])

    def pre_check_cell(self, cell_nodes, refine_geometry: bool = False) -> bool:
        """Bounding-box fast-path used by ``pre_select`` for expensive
        geometries (reference ``geometry_STL_3d.py:105-124``)."""
        bounds = self.bounding_box()
        if bounds is None:
            return self.check_cell(cell_nodes, refine_geometry)
        lower, upper = bounds
        nodes = np.asarray(cell_nodes, dtype=np.float64)
        mask = np.logical_and(nodes >= np.asarray(lower), nodes <= np.asarray(upper)).all(-1)
        return bool(np.asarray(apply_mask(mask[None], self._keep_inside, refine_geometry))[0])

    def bounding_box(self):
        """Optional ``(lower, upper)`` bounds for the pre-select fast path.

        Geometries without a cheap bounding box return None.
        """
        return None

    @property
    def cache_key(self):
        """Stable digest of everything a traced :meth:`mask_points` bakes
        into a compiled program (class, polarity, defining constants).

        Used by the engine to share jitted executables across runs in one
        process — a fresh ``jax.jit`` object forces a re-trace and a new
        executable load on the device even when the compiled program is
        byte-identical.  Returns ``None`` (sharing disabled) when the
        subclass does not declare its trace constants."""
        if getattr(self, "_cache_key_val", None) is None:
            parts = self._trace_constants()
            if parts is None:
                return None
            import hashlib
            h = hashlib.blake2b(digest_size=16)
            h.update(type(self).__name__.encode())
            h.update(b"1" if self._keep_inside else b"0")
            for p in parts:
                a = np.asarray(p)
                h.update(f"|{a.dtype}|{a.shape}|".encode())
                h.update(np.ascontiguousarray(a).tobytes())
            self._cache_key_val = h.hexdigest()
        return self._cache_key_val

    def _trace_constants(self):
        """Arrays/scalars that fully determine this geometry's traced
        mask (everything :meth:`mask_points` closes over, or inputs those
        values derive from deterministically).  ``None`` opts out of
        executable sharing."""
        return None

    @property
    def device_table_bytes(self) -> int:
        """Approximate bytes of device lookup tables a traced
        :meth:`mask_points` references.  Closed-form geometries carry none;
        table-backed ones (large STL acceleration structures) report their
        size so the engine can keep them OUT of outer-jitted kernels —
        arrays referenced inside an outer trace bake into the compiled
        program as constants, which at 100+ MB means minutes-long compiles
        and a poisoned compile cache (see CLAUDE.md).  Such geometries are
        evaluated eagerly instead (their own inner jit passes the tables as
        arguments)."""
        return 0

    # ------------------------------------------------------------------ #
    # validation + metadata                                               #
    # ------------------------------------------------------------------ #
    def _check_common_arguments(self) -> None:
        assert self._name != "", \
            "Every geometry object needs a non-empty name."
        assert isinstance(self._keep_inside, bool), \
            (f"keep_inside must be a bool (True = domain, False = obstacle); "
             f"got {type(self._keep_inside)}.")

        # a provided min_refinement_level implies refine=True
        if not self._refine and self._min_refinement_level is not None:
            logger.warning(
                f"Geometry {self._name} sets min_refinement_level="
                f"{self._min_refinement_level} but refine={self._refine}; a "
                f"target level only makes sense with surface refinement, so "
                f"refine is being switched on.")
            self._refine = True

        if self._refine and self._min_refinement_level is not None:
            assert self._min_refinement_level > 0, \
                (f"min_refinement_level must be a positive level count; got "
                 f"{self._min_refinement_level}.")

    @property
    def keep_inside(self):
        return self._keep_inside

    @property
    def name(self):
        return self._name

    @property
    def refine(self):
        return self._refine

    @property
    def min_refinement_level(self):
        return self._min_refinement_level

    @abstractmethod
    def _check_geometry(self) -> None:
        """Validate the user input."""

    @property
    @abstractmethod
    def type(self) -> str:
        """Short type tag (e.g. ``cube``, ``sphere``, ``STL``)."""

    @property
    @abstractmethod
    def main_width(self) -> float:
        """Width of the dominant dimension (used to size the root cell)."""

    @property
    @abstractmethod
    def center(self):
        """Geometric center (used to position the root cell)."""


def apply_mask(mask, keep_inside: bool, refine_geometry: bool):
    """Reduce a per-node inside-mask ``[M, n_nodes]`` to per-cell invalidity.

    Truth table mirrors the reference (``geometry_base.py:40-76``):

    - removal mode: an obstacle invalidates a cell only if *all* nodes are
      inside; a domain invalidates a cell if *no* node is inside
    - refine-geometry mode: an obstacle flags a cell if *any* node is inside;
      a domain flags a cell if *any* node is outside
    """
    if not refine_geometry:
        if not keep_inside:
            return mask.all(axis=-1)
        return ~mask.any(axis=-1)
    if not keep_inside:
        return mask.any(axis=-1)
    return ~mask.all(axis=-1)

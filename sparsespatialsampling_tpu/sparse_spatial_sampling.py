"""Public façade of the TPU-native S³ implementation.

API mirror of the reference ``SparseSpatialSampling``
(``sparseSpatialSampling/sparse_spatial_sampling.py:20-212``): same
constructor signature, same validation/auto-correction semantics, same
output artifacts (``mesh_info_{name}.pt`` dict and a reloadable
``s_cube_{name}.pt`` object checkpoint) so reference post-processing
scripts (e.g. ``post_processing/compare_execution_times_s_cube.py``) work
unchanged.  Arrays are numpy on the host; all heavy numerics live in the
engine (``engine/tree.py``) and run through JAX.
"""
import logging
import pickle
from os import makedirs, path
from os.path import join
from typing import Union

import numpy as np

from .engine.tree import SamplingTree

logger = logging.getLogger(__name__)


def _save_object(obj, file_path: str) -> None:
    """Persist with ``torch.save`` when torch is importable (keeps the
    artifact loadable by the reference's ``pt.load``-based post-processing),
    plain pickle otherwise."""
    try:
        import torch
        # pickle protocol 4 (vs torch's default 2): ~1.4x faster save, ~6x
        # faster load and ~30 % smaller for numpy-array payloads, and still
        # a regular torch zip archive (``pt.load`` reads it unchanged)
        torch.save(obj, file_path, pickle_protocol=4)
    except ImportError:
        with open(file_path, "wb") as f:
            pickle.dump(obj, f, protocol=4)


def load_s_cube(file_path: str):
    """Reload a pickled :class:`SparseSpatialSampling` checkpoint
    (reference pattern: ``examples/s3_for_cylinder3D_Re3900.py:116-121``)."""
    try:
        import torch
        return torch.load(file_path, weights_only=False)
    except ImportError:
        with open(file_path, "rb") as f:
            return pickle.load(f)


class SparseSpatialSampling:
    """Execute the S³ algorithm: metric-driven adaptive quadtree/octree grid
    generation for CFD data reduction."""

    def __init__(self, coordinates, metric, geometry_objects: list, save_path: str,
                 save_name: str, grid_name: str = "grid_s_cube", uniform_levels: int = 5,
                 n_cells_max: Union[int, float] = None, min_metric: float = 0.75,
                 max_delta_level: bool = False, n_cells_iter_start: int = None,
                 n_cells_iter_end: int = None, n_jobs: int = 1,
                 relTol: Union[int, float] = 1e-3, reach_at_least: float = 0.75,
                 pre_select_cells: bool = False):
        """
        :param coordinates: coordinates of the original grid ``[N, d]``
        :param metric: refinement-indicator field ``[N]`` (e.g. std(p) over time)
        :param geometry_objects: list of geometry objects; at least one must
            have ``keep_inside=True`` (the numerical domain)
        :param save_path: directory for the generated grid and data
        :param save_name: base name of the output files
        :param grid_name: grid name used in the XDMF file
        :param uniform_levels: number of uniform refinement cycles
        :param n_cells_max: max number of cells (overrides ``min_metric``)
        :param min_metric: target captured-metric fraction
        :param max_delta_level: enforce a max level difference of one between
            adjacent cells
        :param n_cells_iter_start: cells refined per iteration at the start
        :param n_cells_iter_end: cells refined per iteration at the end
        :param n_jobs: accepted for reference drop-in compatibility; the TPU
            backend has no process pool and ignores it
        :param relTol: min improvement between consecutive iterations
        :param reach_at_least: fraction of the target to reach before the
            relTol stopping criterion arms
        :param pre_select_cells: bbox fast-path for expensive geometries
        """
        self.n_jobs = n_jobs
        self.coordinates = np.asarray(coordinates)
        self.metric = np.asarray(metric)
        self.save_path = save_path
        self.save_name = save_name
        self.grid_name = grid_name

        # results copied off the SamplingTree after execution
        self.centers = None
        self.vertices = None
        self.faces = None
        self.n_dimensions = int(np.squeeze(self.coordinates).shape[-1])
        self.size_initial_cell = None
        self.levels = None
        self.data_final_mesh = None

        self._geometries = geometry_objects
        self._pre_select_cells = pre_select_cells
        self._level_bounds = int(uniform_levels)
        self._n_cells_max = n_cells_max if n_cells_max is None else int(n_cells_max)
        self._min_metric = min_metric
        self._max_delta_level = max_delta_level
        self._n_cells_iter_start = (n_cells_iter_start if n_cells_iter_start is None
                                    else int(n_cells_iter_start))
        self._n_cells_iter_end = (n_cells_iter_end if n_cells_iter_end is None
                                  else int(n_cells_iter_end))
        self._relTol = relTol
        self._reach_at_least = reach_at_least

        self._check_input()

        self._sampling = SamplingTree(
            self.coordinates, self.metric, self._geometries, n_cells=self._n_cells_max,
            uniform_level=self._level_bounds, min_metric=self._min_metric,
            max_delta_level=self._max_delta_level, n_cells_iter_end=self._n_cells_iter_end,
            n_cells_iter_start=self._n_cells_iter_start, n_jobs=self.n_jobs,
            relTol=self._relTol, reach_at_least=self._reach_at_least,
            pre_select=self._pre_select_cells)

    def execute_grid_generation(self) -> None:
        """Run the refinement and persist the results
        (reference ``execute_grid_generation``,
        ``sparse_spatial_sampling.py:116-146``)."""
        from time import perf_counter
        if not path.exists(self.save_path):
            makedirs(self.save_path)

        self._sampling.refine()
        t0 = perf_counter()

        self.data_final_mesh = self._sampling.data_final_mesh

        self.levels = self._sampling.all_levels
        self.centers = self._sampling.all_centers
        self.vertices = self._sampling.all_nodes
        self.faces = self._sampling.face_ids
        self.size_initial_cell = self.data_final_mesh["size_initial_cell"]
        # final-grid copies (lazy float64 assembly) — tracked so every
        # second of the e2e refine wall sits in a named phase bucket
        self.data_final_mesh["t_finalize"] = perf_counter() - t0

        _save_object(self.data_final_mesh,
                     join(self.save_path, f"mesh_info_{self.save_name}.pt"))

        # keep the engine's k-NN index for ExportData to reuse (same CFD
        # cloud → identical index; saves the Morton sort + grid build +
        # device uploads at export time). NOT part of the pickled
        # checkpoint: it holds device buffers, and it is attached after
        # ``_save_object`` below on purpose.
        knn_index = self._sampling._knn

        # drop the tree; the checkpoint only needs the final grid
        self._sampling = None

        # prefetch the default export weight cache in a worker thread: the
        # device k-NN queries, index readback and CSR pack overlap the
        # checkpoint pickling below (~0.5-1 s of pure host/disk work), so a
        # following ``ExportData(...)`` with default settings starts with a
        # warm cache instead of paying the build on its critical path.
        # Grid-only pipelines that never export can turn the speculative
        # build off with ``S3_TPU_EXPORT_PREFETCH=0`` (it costs one k-NN
        # query sweep + a weight readback of device time they don't need).
        import os
        from .ops.knn import KNNIndex
        from .parallel import sharding_enabled
        prefetch = {"thread": None, "k": None, "data": {}}
        if (isinstance(knn_index, KNNIndex) and not sharding_enabled()
                and os.environ.get("S3_TPU_EXPORT_PREFETCH", "1") != "0"
                and os.environ.get("S3_TPU_INTERP", "host") != "device"):
            import threading
            k = 8 if self.n_dimensions == 2 else 26
            centers = self.centers

            def _prefetch_weights():
                try:
                    # the same helper ExportData._build_knn_cache runs, so
                    # the prefetched cache is byte-identical to the
                    # fallback build by construction
                    from .ops.interpolate import build_host_weight_cache
                    prefetch["data"]["centers"] = build_host_weight_cache(
                        knn_index, centers, k)
                except Exception as exc:   # fall back to the normal build
                    logger.debug(f"weight-cache prefetch skipped: {exc!r}")

            prefetch["k"] = k
            prefetch["thread"] = threading.Thread(
                target=_prefetch_weights, daemon=True)
            prefetch["thread"].start()

        t1 = perf_counter()
        _save_object(self, join(self.save_path, f"s_cube_{self.save_name}.pt"))
        # in-memory only (the mesh-info artifact is already on disk)
        self.data_final_mesh["t_checkpoint"] = perf_counter() - t1
        self._knn_index = knn_index
        self._knn_prefetch = prefetch

    def __getstate__(self):
        """Checkpoints never carry the runtime k-NN index (device buffers
        aren't picklable; ``ExportData`` rebuilds one on reload)."""
        state = self.__dict__.copy()
        state.pop("_knn_index", None)
        state.pop("_knn_prefetch", None)   # holds a thread + device-derived
        return state                       # arrays; ExportData rebuilds

    def _check_input(self) -> None:
        """Validate + auto-correct user settings (behavioral mirror of the
        reference ``_check_input``, ``sparse_spatial_sampling.py:148-186``;
        independently worded diagnostics)."""
        assert np.squeeze(self.metric).ndim == 1, (
            f"'metric' must be a flat per-point array (one value for each of "
            f"the {self.coordinates.shape[0]} grid points); got shape "
            f"{self.metric.shape} instead.")

        if self._n_cells_max is None and self._min_metric > 1:
            logger.warning("'min_metric' is a captured-metric fraction and "
                           "cannot exceed 1 — clamping it to 1.")
            self._min_metric = 1

        assert self._geometries, (
            "'geometry_objects' is empty — pass at least the domain geometry "
            "(a geometry object constructed with keep_inside=True).")
        assert any(g.keep_inside for g in self._geometries), (
            "None of the geometry objects has keep_inside=True; exactly that "
            "object defines the numerical domain S³ refines within.")

        if self._level_bounds <= 0:
            logger.warning(f"'uniform_levels' must be at least 1 (got "
                           f"{self._level_bounds}) — raising it to 1.")
            self._level_bounds = 1

        if self._n_cells_max is not None:
            logger.warning(
                "'n_cells_max' takes precedence as the stopping criterion: "
                "the run stops at the cell budget and 'min_metric' is "
                "ignored. Leave 'n_cells_max' unset (None) to stop on the "
                "captured-metric target instead.")


def list_geometries() -> None:
    """Log every available geometry class with a one-line summary
    (behavioral mirror of the reference ``list_geometries``,
    ``sparse_spatial_sampling.py:190-212``)."""
    from . import geometry
    from .geometry.base import GeometryObject

    entries = {}
    for attr in dir(geometry):
        cls = getattr(geometry, attr)
        if (isinstance(cls, type) and issubclass(cls, GeometryObject)
                and cls is not GeometryObject):
            doc = getattr(cls, "__short_description__", None) or (cls.__doc__ or "")
            summary = " ".join(doc.split())
            if len(summary) > 96:
                summary = summary[:96].rsplit(" ", 1)[0] + " ..."
            entries[cls.__name__] = summary

    pad = max(map(len, entries), default=0)
    lines = ["", "\tGeometry classes shipped with this package:"]
    lines += [f"\t  {name:<{pad}}  {desc}"
              for name, desc in sorted(entries.items())]
    lines.append("\tSee the package docs for each class's constructor details.")
    logger.info("\n".join(lines))

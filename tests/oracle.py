"""Pure-numpy oracle: an INDEPENDENT implementation of the reference S³
algorithm, used only by the parity tests.

This is a from-scratch, readable re-implementation of the algorithm
specified by the reference engine (``/root/reference/sparseSpatialSampling/
s_cube.py``) — brute-force exact k-NN, per-cell Python objects, heap
selection, the published gain / ramp / stopping formulas — with NONE of the
TPU engine's machinery (no lattice arrays, no fused epochs, no JAX).  It
exists to answer "does the TPU engine actually implement the reference
algorithm?" given that the reference itself cannot run here (numba and
flowtorch are not installed).

Semantics pinned against the reference (file:line cites):
- root cell from the domain's main width/center        (s_cube.py:338-397)
- gain formula (1/2^d)(w/2^l)^d * sum|dm| / gain_0     (s_cube.py:1840-1859)
- per-iteration linear cells-per-iter ramp             (s_cube.py:286-315)
- selection: top-K by (gain, -creation_index)          (s_cube.py:601-602)
- stopping criteria, both modes                        (s_cube.py:263-284)
- captured metric = ||knn(leaf centers)|| / ||target|| (s_cube.py:317-336)
- invalid-cell masks (all-nodes-inside / no-node-inside
  polarity, surface flip in refine-geometry mode)      (geometry_base.py:40-76)
- 2:1 constraint: transitive refinement of coarser
  leaf neighbors over all 8/26 direction slots         (s_cube.py:447-506)
- geometry refinement level loop                       (s_cube.py:774-863)

Distance-weighted k-NN prediction follows sklearn's
``KNeighborsRegressor(weights="distance")``: weights 1/d, except that
exact matches (d == 0) take over the whole prediction.
"""
import numpy as np


class OracleKNN:
    """Brute-force exact k-NN regressor, f64 (sklearn-semantics)."""

    def __init__(self, points, values, k):
        self.points = np.asarray(points, dtype=np.float64)
        self.values = np.asarray(values, dtype=np.float64)
        self.k = min(k, self.points.shape[0])

    def predict(self, queries):
        q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
        out = np.empty(q.shape[0])
        # chunk the [M, N] distance matrix to bound memory on larger clouds
        step = max(1, int(2e7) // max(1, self.points.shape[0]))
        for s in range(0, q.shape[0], step):
            qq = q[s:s + step]
            d = np.sqrt(((qq[:, None, :] - self.points[None, :, :]) ** 2)
                        .sum(-1))
            idx = np.argpartition(d, self.k - 1, axis=1)[:, :self.k]
            dd = np.take_along_axis(d, idx, 1)
            vv = self.values[idx]
            for i in range(qq.shape[0]):
                zero = dd[i] == 0.0
                if zero.any():
                    out[s + i] = vv[i][zero].mean()
                else:
                    w = 1.0 / dd[i]
                    out[s + i] = (w * vv[i]).sum() / w.sum()
        return out


class OracleGeometry:
    """Minimal geometry spec for the oracle: an inside-predicate plus the
    reference's mask-reduction polarity (geometry_base.py:40-76)."""

    def __init__(self, name, keep_inside, inside_fn, refine=False,
                 min_refinement_level=None, main_width=None, center=None):
        self.name = name
        self.keep_inside = keep_inside
        self.inside_fn = inside_fn            # [M, d] -> bool[M]
        self.refine = refine or (min_refinement_level is not None)
        self.min_refinement_level = min_refinement_level
        self.main_width = main_width
        self.center = center

    def check_cell(self, nodes, refine_geometry=False) -> bool:
        mask = self.inside_fn(nodes)
        if not refine_geometry:
            return bool(mask.all()) if not self.keep_inside \
                else not bool(mask.any())
        return bool(mask.any()) if not self.keep_inside \
            else not bool(mask.all())


def cube_inside(lower, upper):
    lo = np.asarray(lower, dtype=np.float64)
    hi = np.asarray(upper, dtype=np.float64)

    def fn(p):
        return np.logical_and(p >= lo, p <= hi).all(axis=1)
    return fn


def sphere_inside(center, radius):
    c = np.asarray(center, dtype=np.float64)

    def fn(p):
        return ((p - c) ** 2).sum(axis=1) <= radius ** 2
    return fn


class _Cell:
    __slots__ = ("index", "level", "center", "gain", "metric", "leaf")

    def __init__(self, index, level, center):
        self.index = index
        self.level = level
        self.center = center
        self.gain = 0.0
        self.metric = 0.0
        self.leaf = True        # False once split OR removed as invalid


class OracleS3:
    """Reference-semantics S³ refinement over small point clouds."""

    def __init__(self, vertices, metric, geometries, n_cells_max=None,
                 uniform_levels=5, min_metric=0.75, max_delta_level=False,
                 n_cells_iter_start=None, n_cells_iter_end=None,
                 rel_tol=1e-3, reach_at_least=0.75):
        vertices = np.asarray(vertices, dtype=np.float64)
        metric = np.asarray(metric, dtype=np.float64)
        self.d = vertices.shape[1]
        self.geometries = geometries
        self.n_cells_max = n_cells_max
        self.min_metric = min(min_metric, 1.0)
        self.max_delta_level = max_delta_level
        self.uniform_levels = max(uniform_levels, 1)
        self.rel_tol = rel_tol
        self.reach_at_least = reach_at_least

        self.cells_per_iter_start = (int(0.001 * len(vertices))
                                     if n_cells_iter_start is None
                                     else n_cells_iter_start)
        if self.cells_per_iter_start <= 0:
            self.cells_per_iter_start = 1
        self.cells_per_iter_end = (self.cells_per_iter_start
                                   if n_cells_iter_end is None
                                   else n_cells_iter_end)
        self.cells_per_iter = self.cells_per_iter_start
        self.cells_per_iter_last = 1e9

        self.knn = OracleKNN(vertices, metric,
                             k=8 if self.d == 2 else 26)
        self.target_norm = float(np.linalg.norm(metric))

        # reference child-offset direction order (s_cube.py:188-194)
        if self.d == 2:
            self.directions = np.array(
                [[-1, -1], [-1, 1], [1, 1], [1, -1]], dtype=np.float64)
        else:
            self.directions = np.array(
                [[-1, -1, 1], [-1, 1, 1], [1, 1, 1], [1, -1, 1],
                 [-1, -1, -1], [-1, 1, -1], [1, 1, -1], [1, -1, -1]],
                dtype=np.float64)

        domain = next(g for g in geometries if g.keep_inside)
        self.width = float(domain.main_width)
        root_center = np.asarray(domain.center, dtype=np.float64)

        # root cell + gain_0 (s_cube.py:338-397)
        child_centers = (root_center
                         + self.directions * 0.25 * self.width)
        pred = self.knn.predict(
            np.concatenate([root_center[None], child_centers]))
        sum_delta = np.abs(pred[0] - pred[1:]).sum()
        gain0 = (self.width / 2.0) ** self.d * sum_delta
        self.gain0 = 1.0 if abs(gain0) < 1e-6 else gain0

        self.cells = [_Cell(0, 0, root_center)]
        self.cells[0].metric = pred[0]
        self.leaves = {0}
        self.n_cells = 1
        self.metric_trace = []
        self.n_cells_after_uniform = None

    # -- primitives ---------------------------------------------------- #
    def cell_size(self, level):
        return self.width / (2 ** level)

    def child_centers(self, cell):
        return (cell.center
                + self.directions * 0.25 * self.cell_size(cell.level))

    def cell_nodes(self, cell):
        return (cell.center
                + self.directions * 0.5 * self.cell_size(cell.level))

    def _update_gain(self, new_idx):
        """Gain + metric for newly created cells (s_cube.py:207-241)."""
        for i in new_idx:
            cell = self.cells[i]
            centers = np.concatenate([cell.center[None],
                                      self.child_centers(cell)])
            pred = self.knn.predict(centers)
            sum_delta = np.abs(pred[0] - pred[1:]).sum()
            lvl = cell.level
            cell.gain = ((1.0 / 2 ** self.d)
                         * (self.width / 2 ** lvl) ** self.d
                         * sum_delta / self.gain0)
            cell.metric = pred[0]

    def _refine_cells(self, to_refine):
        """Split each cell into 2^d children (s_cube.py:865-902);
        returns new child indices (creation order)."""
        new_idx = []
        for i in sorted(to_refine):
            parent = self.cells[i]
            parent.leaf = False
            self.leaves.discard(i)
            for ctr in self.child_centers(parent):
                c = _Cell(len(self.cells), parent.level + 1, ctr)
                self.cells.append(c)
                self.leaves.add(c.index)
                new_idx.append(c.index)
                self.n_cells += 1
        self._update_gain(new_idx)
        return new_idx

    def _invalid(self, cell, geometries, refine_geometry=False):
        nodes = self.cell_nodes(cell)
        for g in geometries:
            if g.check_cell(nodes, refine_geometry):
                return True
        return False

    def _remove_invalid(self, idx_set, geometry=None):
        geoms = self.geometries if geometry is None else [geometry]
        for i in idx_set:
            if self._invalid(self.cells[i], geoms):
                self.cells[i].leaf = False
                self.cells[i].gain = 0.0
                self.leaves.discard(i)

    def _surface_cells(self, idx_set, geometry):
        """Refine-geometry mode of _remove_invalid_cells: return the cells
        straddling the geometry surface instead of deleting."""
        return {i for i in idx_set
                if self._invalid(self.cells[i], [geometry],
                                 refine_geometry=True)}

    def _captured_metric(self):
        leaves = sorted(self.leaves)
        pred = np.array([self.cells[i].metric for i in leaves])
        ratio = float(np.linalg.norm(pred) / self.target_norm)
        self.metric_trace.append(ratio)
        return ratio

    # -- 2:1 constraint (s_cube.py:447-506) ----------------------------- #
    def _leaf_containing(self, point):
        """The alive leaf whose box contains ``point`` (None if none)."""
        for i in self.leaves:
            c = self.cells[i]
            half = 0.5 * self.cell_size(c.level)
            if np.all(np.abs(point - c.center) < half):
                return i
        return None

    def _check_nb(self, i):
        """Coarser leaf neighbors over all 8/26 direction slots."""
        cell = self.cells[i]
        size = self.cell_size(cell.level)
        out = []
        for dvec in _nb_directions(self.d):
            nb = self._leaf_containing(cell.center + dvec * size)
            if nb is not None and self.cells[nb].level < cell.level:
                out.append(nb)
        return out

    def _check_constraint(self, violating):
        while violating:
            tmp = set()
            for c in violating:
                tmp.update(self._check_nb(c))
            if not tmp or tmp.issubset(violating):
                break
            violating |= tmp
        return violating

    # -- driver (s_cube.py:563-667) ------------------------------------- #
    def _check_stopping(self):
        if self.n_cells_max is None:
            m = self.metric_trace
            if len(m) > 1 and m[-1] / self.min_metric >= self.reach_at_least:
                return (m[-1] < self.min_metric
                        and abs(m[-1] - m[-2]) > self.rel_tol)
        else:
            n = len(self.leaves)
            if n / self.n_cells_max >= self.reach_at_least:
                rel_stop = abs(self.cells_per_iter / self.n_cells_max
                               - self.cells_per_iter_last / self.n_cells_max)
                return n < self.n_cells_max and rel_stop > self.rel_tol
        return True

    def _compute_cells_per_iter(self):
        if self.n_cells_max is None:
            delta_x = self.min_metric - self.metric_trace[0]
            current_x = self.metric_trace[-1]
        else:
            delta_x = self.n_cells_max - self.n_cells_after_uniform
            current_x = len(self.leaves)
        delta_y = self.cells_per_iter_start - self.cells_per_iter_end
        new = self.cells_per_iter_start - (delta_y / delta_x) * current_x
        self.cells_per_iter_last = self.cells_per_iter
        self.cells_per_iter = int(new) if new > 1 else 1

    def refine(self):
        # uniform phase (s_cube.py:508-561)
        for _ in range(self.uniform_levels):
            new_idx = self._refine_cells(set(self.leaves))
            self._remove_invalid(set(new_idx))

        self.n_cells_after_uniform = len(self.leaves)
        if self.n_cells_max is None:
            self._captured_metric()

        # adaptive loop
        while self._check_stopping():
            if len(self.metric_trace) >= 2:
                self._compute_cells_per_iter()
            k = min(self.cells_per_iter, self.n_cells, len(self.leaves))
            selected = sorted(self.leaves,
                              key=lambda i: (self.cells[i].gain, -i),
                              reverse=True)[:k]
            to_refine = set(selected)
            if self.max_delta_level:
                for i in selected:
                    nbv = set(self._check_nb(i))
                    to_refine |= self._check_constraint(nbv)
            new_idx = self._refine_cells(to_refine)
            self._remove_invalid(set(new_idx))
            if self.n_cells_max is None:
                self._captured_metric()

        if self.n_cells_max is not None:
            self._captured_metric()

        self._refine_geometries()
        return self

    # -- geometry refinement (s_cube.py:774-863) ------------------------ #
    def _refine_geometries(self):
        for g in self.geometries:
            if not g.refine:
                continue
            all_cells = self._surface_cells(set(self.leaves), g)
            if not all_cells:
                return      # reference: warn + abandon the whole phase
            gmin = min(self.cells[i].level for i in all_cells)
            gmax = (g.min_refinement_level
                    if g.min_refinement_level is not None
                    else max(self.cells[i].level for i in all_cells))
            while gmax > gmin:
                to_refine, checked = set(), set()
                for i in all_cells:
                    if i in checked:
                        continue
                    if self.cells[i].level < gmax:
                        to_refine.add(i)
                    if self.max_delta_level:
                        nbv = set(self._check_nb(i))
                        nbv = self._check_constraint(nbv)
                        to_refine |= nbv
                        checked |= nbv
                new_idx = self._refine_cells(to_refine)
                self._remove_invalid(set(new_idx), geometry=g)
                survivors = {i for i in new_idx if self.cells[i].leaf}
                all_cells = self._surface_cells(survivors, g)
                gmin += 1

    # -- outputs -------------------------------------------------------- #
    def leaf_levels_and_centers(self):
        leaves = sorted(self.leaves)
        levels = np.array([self.cells[i].level for i in leaves])
        centers = np.stack([self.cells[i].center for i in leaves])
        return levels, centers

    def lattice_keys(self):
        """Canonical (level, integer lattice coords) per leaf for exact
        set comparison against the TPU engine's grid."""
        levels, centers = self.leaf_levels_and_centers()
        domain = next(g for g in self.geometries if g.keep_inside)
        lo = (np.asarray(domain.center, dtype=np.float64)
              - 0.5 * self.width)
        size = self.width / (2.0 ** levels)
        ij = np.rint((centers - lo) / size[:, None] - 0.5).astype(np.int64)
        return {(int(l), *map(int, row)) for l, row in zip(levels, ij)}


def _nb_directions(d):
    dirs = np.stack(np.meshgrid(*([np.array([-1.0, 0.0, 1.0])] * d),
                                indexing="ij"), axis=-1).reshape(-1, d)
    return dirs[~(dirs == 0).all(axis=1)]

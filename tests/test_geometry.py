"""Geometry predicate truth tables.

Mirrors the reference per-geometry test strategy
(``sparseSpatialSampling/tests/test_*_geometry.py``): canonical inside /
outside / partially-overlapping cells for both ``keep_inside`` polarities,
plus constructor validation failures, plus the vectorized batch API.
"""
import numpy as np
import pytest

from sparsespatialsampling_tpu.geometry import (
    CubeGeometry, SphereGeometry, CylinderGeometry3D, TriangleGeometry,
    PrismGeometry3D, TetrahedronGeometry3D, PyramidGeometry3D,
    GeometryCoordinates2D, GeometrySTL3D, GeometryObject, apply_mask,
)
from sparsespatialsampling_tpu.geometry.stl import write_stl, read_stl

from .const import DummyCells

CELLS = DummyCells()


# --------------------------------------------------------------------------- #
# base class behavior                                                          #
# --------------------------------------------------------------------------- #
class DummyGeometry(GeometryObject):
    def __init__(self, name="dummy", keep_inside=False, refine=False,
                 min_refinement_level=None):
        super().__init__(name, keep_inside, refine, min_refinement_level)

    def mask_points(self, points):
        # inside the unit square
        return np.logical_and(points >= 0.0, points <= 1.0).all(-1)

    def _check_geometry(self):
        pass

    @property
    def type(self):
        return "dummy"

    @property
    def main_width(self):
        return 1.0

    @property
    def center(self):
        return np.asarray([0.5, 0.5])


class TestGeometryBase:
    def test_empty_name_raises(self):
        with pytest.raises(AssertionError):
            DummyGeometry(name="")

    def test_keep_inside_type(self):
        with pytest.raises(AssertionError):
            DummyGeometry(keep_inside="yes")

    def test_refine_auto_promotion(self):
        g = DummyGeometry(refine=False, min_refinement_level=3)
        assert g.refine is True
        assert g.min_refinement_level == 3

    def test_min_refinement_level_validation(self):
        with pytest.raises(AssertionError):
            DummyGeometry(refine=True, min_refinement_level=0)

    @pytest.mark.parametrize("keep_inside,refine_geometry,expected", [
        # mask [True, False]: one node in, one node out
        (False, False, False),   # geometry: not all inside -> valid
        (True, False, False),    # domain: some inside -> valid
        (False, True, True),     # refine: any inside -> surface cell
        (True, True, True),      # refine: any outside -> surface cell
    ])
    def test_apply_mask_truth_table(self, keep_inside, refine_geometry, expected):
        mask = np.asarray([[True, False]])
        res = np.asarray(apply_mask(mask, keep_inside, refine_geometry))
        assert bool(res[0]) is expected

    def test_apply_mask_all_inside(self):
        mask = np.asarray([[True, True]])
        assert bool(np.asarray(apply_mask(mask, False, False))[0]) is True
        assert bool(np.asarray(apply_mask(mask, True, False))[0]) is False

    def test_apply_mask_none_inside(self):
        mask = np.asarray([[False, False]])
        assert bool(np.asarray(apply_mask(mask, False, False))[0]) is False
        assert bool(np.asarray(apply_mask(mask, True, False))[0]) is True


# --------------------------------------------------------------------------- #
# per-geometry truth tables                                                    #
# --------------------------------------------------------------------------- #
def _check(geometry, cell, expected):
    assert geometry.check_cell(cell) is expected


class TestCubeGeometry:
    @pytest.mark.parametrize("keep_inside,cell,expected", [
        (False, "outside", False), (False, "inside", True), (False, "partially", False),
        (True, "outside", True), (True, "inside", False), (True, "partially", False),
    ])
    def test_2d(self, keep_inside, cell, expected):
        g = CubeGeometry("cube2D", keep_inside, [0.0, 0.0], [1.0, 1.0])
        _check(g, CELLS.cells_2D[cell], expected)

    @pytest.mark.parametrize("keep_inside,cell,expected", [
        (False, "outside", False), (False, "inside", True), (False, "partially", False),
        (True, "outside", True), (True, "inside", False), (True, "partially", False),
    ])
    def test_3d(self, keep_inside, cell, expected):
        g = CubeGeometry("cube3D", keep_inside, [0.0] * 3, [1.0] * 3)
        _check(g, CELLS.cells_3D[cell], expected)

    def test_validation(self):
        with pytest.raises(AssertionError):
            CubeGeometry("c", False, [], [1.0])
        with pytest.raises(AssertionError):
            CubeGeometry("c", False, [0.0, 0.0], [1.0])
        with pytest.raises(AssertionError):
            CubeGeometry("c", False, [1.0, 0.0], [0.0, 1.0])

    def test_domain_properties(self):
        g = CubeGeometry("domain", True, [0.0, 0.0], [2.0, 1.0])
        assert g.main_width == 2.0
        assert np.allclose(np.asarray(g.center), [1.0, 0.5])


class TestSphereGeometry:
    @pytest.mark.parametrize("keep_inside,cell,expected", [
        (False, "outside", False), (False, "inside", True), (False, "partially", False),
        (True, "outside", True), (True, "inside", False), (True, "partially", False),
    ])
    def test_2d(self, keep_inside, cell, expected):
        g = SphereGeometry("circle", keep_inside, [0.5, 0.5], 1.0)
        _check(g, CELLS.cells_2D[cell], expected)

    def test_2d_full_containment(self):
        # unit square fully inside circle of radius 2 -> even the "partially"
        # cell is entirely contained and therefore invalid
        g = SphereGeometry("circle", False, [0.5, 0.5], 2.0)
        assert g.check_cell(CELLS.cell_partially_2D) is True

    @pytest.mark.parametrize("keep_inside,cell,expected", [
        (False, "outside", False), (False, "inside", True),
        (True, "outside", True), (True, "inside", False),
    ])
    def test_3d(self, keep_inside, cell, expected):
        g = SphereGeometry("sphere", keep_inside, [0.5, 0.5, 0.5], 2.0)
        _check(g, CELLS.cells_3D[cell], expected)

    def test_validation(self):
        with pytest.raises(AssertionError):
            SphereGeometry("s", False, [], 1.0)
        with pytest.raises(AssertionError):
            SphereGeometry("s", False, [0.0, 0.0], -1.0)

    def test_dimension_mismatch(self):
        g = SphereGeometry("s", False, [0.0, 0.0, 0.0], 1.0)
        with pytest.raises(AssertionError):
            g.check_cell(CELLS.cell_inside_2D)


class TestCylinderGeometry:
    @pytest.mark.parametrize("keep_inside,cell,expected", [
        (False, "outside", False), (False, "inside", True), (False, "partially", False),
        (True, "outside", True), (True, "inside", False), (True, "partially", False),
    ])
    def test_3d(self, keep_inside, cell, expected):
        # cylinder along z through the unit cube, radius 1
        g = CylinderGeometry3D("cyl", keep_inside,
                               [(0.5, 0.5, -0.5), (0.5, 0.5, 1.5)], 1.0)
        _check(g, CELLS.cells_3D[cell], expected)

    def test_cone(self):
        # cone with apex at top; base radius 2 covers the unit cube bottom
        g = CylinderGeometry3D("cone", False, [(0.5, 0.5, 0.0), (0.5, 0.5, 4.0)],
                               [2.0, 0.0])
        pts = np.asarray([[0.5, 0.5, 0.1], [2.4, 0.5, 0.1], [0.5, 0.5, 3.9],
                          [2.0, 0.5, 3.9]])
        mask = np.asarray(g.mask_points(pts))
        assert mask.tolist() == [True, True, True, False]

    def test_validation(self):
        with pytest.raises(AssertionError):
            CylinderGeometry3D("c", False, [(0, 0, 0)], 1.0)
        with pytest.raises(AssertionError):
            CylinderGeometry3D("c", False, [(0, 0, 0), (0, 0, 0)], 1.0)
        with pytest.raises(AssertionError):
            CylinderGeometry3D("c", False, [(0, 0, 0), (0, 0, 1)], -1.0)
        with pytest.raises(AssertionError):
            CylinderGeometry3D("c", False, [(0, 0, 0), (0, 0, 1)], [0.0, 0.0])


class TestTriangleGeometry:
    @pytest.mark.parametrize("keep_inside,cell,expected", [
        (False, "outside", False), (False, "inside", True), (False, "partially", True),
        (True, "outside", True), (True, "inside", False), (True, "partially", False),
    ])
    def test_2d(self, keep_inside, cell, expected):
        # large triangle fully containing both the inside and partially cells
        g = TriangleGeometry("tri", keep_inside,
                             [[-2.0, -2.0], [4.0, -2.0], [1.0, 5.0]])
        _check(g, CELLS.cells_2D[cell], expected)

    def test_partial_overlap(self):
        # triangle crossing the unit square: some nodes in, some out -> valid
        g = TriangleGeometry("tri", False, [[0.5, 0.0], [3.0, 0.0], [1.5, 3.0]])
        assert g.check_cell(CELLS.cell_inside_2D) is False

    def test_validation_area_zero(self):
        with pytest.raises(AssertionError):
            TriangleGeometry("t", False, [[0, 0], [1, 1], [2, 2]])

    def test_validation_wrong_count(self):
        with pytest.raises(AssertionError):
            TriangleGeometry("t", False, [[0, 0], [1, 0]])

    def test_edge_points_inside(self):
        g = TriangleGeometry("t", False, [[0.0, 0.0], [2.0, 0.0], [1.0, 2.0]])
        pts = np.asarray([[1.0, 0.0], [0.0, 0.0], [3.0, 0.0]])
        mask = np.asarray(g.mask_points(pts))
        assert mask.tolist() == [True, True, False]


class TestPrismGeometry:
    def _prism(self, keep_inside):
        # triangular prism extruded along z covering the unit cube
        tri = [[-1.0, -1.0], [3.0, -1.0], [1.0, 4.0]]
        return PrismGeometry3D(
            "prism", keep_inside,
            [[[t[0], t[1], -0.5] for t in tri], [[t[0], t[1], 1.5] for t in tri]])

    @pytest.mark.parametrize("keep_inside,cell,expected", [
        (False, "outside", False), (False, "inside", True),
        (True, "outside", True), (True, "inside", False),
    ])
    def test_3d(self, keep_inside, cell, expected):
        _check(self._prism(keep_inside), CELLS.cells_3D[cell], expected)

    def test_validation(self):
        with pytest.raises(AssertionError):
            PrismGeometry3D("p", False, [])
        with pytest.raises(AssertionError):
            PrismGeometry3D("p", False, [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]])


class TestTetrahedronGeometry:
    def _tet(self, keep_inside):
        # large tetrahedron containing the unit cube
        return TetrahedronGeometry3D(
            "tet", keep_inside,
            [[-2, -2, -1], [6, -2, -1], [0.5, 6, -1], [0.5, 0.5, 8]])

    @pytest.mark.parametrize("keep_inside,cell,expected", [
        (False, "outside", False), (False, "inside", True),
        (True, "outside", True), (True, "inside", False),
    ])
    def test_3d(self, keep_inside, cell, expected):
        _check(self._tet(keep_inside), CELLS.cells_3D[cell], expected)

    def test_validation_volume_zero(self):
        with pytest.raises(AssertionError):
            TetrahedronGeometry3D(
                "t", False, [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]])


class TestPyramidGeometry:
    def _pyr(self, keep_inside):
        # pyramid with large base under the unit cube, apex above it
        return PyramidGeometry3D(
            "pyr", keep_inside,
            [(-4.0, -4.0, -0.5), (5.0, -4.0, -0.5), (5.0, 5.0, -0.5),
             (-4.0, 5.0, -0.5), (0.5, 0.5, 8.0)])

    @pytest.mark.parametrize("keep_inside,cell,expected", [
        (False, "outside", False), (False, "inside", True),
        (True, "outside", True), (True, "inside", False),
    ])
    def test_3d(self, keep_inside, cell, expected):
        _check(self._pyr(keep_inside), CELLS.cells_3D[cell], expected)

    def test_validation(self):
        with pytest.raises(AssertionError):
            PyramidGeometry3D("p", False, [(0, 0, 0), (1, 0, 0), (1, 1, 0)])


class TestCoordinates2D:
    def _poly(self, keep_inside):
        # big diamond around the unit square
        return GeometryCoordinates2D(
            "poly", keep_inside,
            [[-3.0, 0.5], [0.5, -3.0], [4.0, 0.5], [0.5, 4.0], [-3.0, 0.5]])

    @pytest.mark.parametrize("keep_inside,cell,expected", [
        (False, "outside", False), (False, "inside", True),
        (True, "outside", True), (True, "inside", False),
    ])
    def test_2d(self, keep_inside, cell, expected):
        _check(self._poly(keep_inside), CELLS.cells_2D[cell], expected)

    def test_pre_check_cell(self):
        g = self._poly(False)
        assert g.pre_check_cell(CELLS.cell_outside_2D) is False

    def test_auto_close(self):
        g = GeometryCoordinates2D("p", False, [[0, 0], [1, 0], [1, 1], [0, 1]])
        pts = np.asarray([[0.5, 0.5], [2.0, 2.0]])
        assert np.asarray(g.mask_points(pts)).tolist() == [True, False]


class TestSTLGeometry:
    @pytest.fixture
    def cube_stl(self, tmp_path):
        """Write a unit-cube STL (12 triangles) to disk."""
        v = np.asarray([[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)],
                       dtype=np.float64)
        # 12 triangles (outward-oriented) of the unit cube
        faces = [
            (0, 2, 1), (1, 2, 3),  # bottom z=0
            (4, 5, 6), (5, 7, 6),  # top z=1
            (0, 1, 4), (1, 5, 4),  # y=0
            (2, 6, 3), (3, 6, 7),  # y=1
            (0, 4, 2), (2, 4, 6),  # x=0
            (1, 3, 5), (3, 7, 5),  # x=1
        ]
        tris = np.stack([v[list(f)] for f in faces])
        path = str(tmp_path / "cube.stl")
        write_stl(path, tris)
        return path

    def test_read_roundtrip(self, cube_stl):
        tris = read_stl(cube_stl)
        assert tris.shape == (12, 3, 3)

    @pytest.mark.parametrize("keep_inside,cell,expected", [
        (False, "outside", False), (False, "partially", False),
        (True, "outside", True), (True, "partially", False),
    ])
    def test_3d(self, cube_stl, keep_inside, cell, expected):
        g = GeometrySTL3D("stl", keep_inside, cube_stl)
        _check(g, CELLS.cells_3D[cell], expected)

    def test_inside_points(self, cube_stl):
        g = GeometrySTL3D("stl", False, cube_stl)
        pts = np.asarray([[0.5, 0.5, 0.5], [0.1, 0.9, 0.5], [1.5, 0.5, 0.5],
                          [-0.1, 0.5, 0.5]])
        mask = np.asarray(g.mask_points(pts))
        assert mask.tolist() == [True, True, False, False]

    def test_pre_check_cell(self, cube_stl):
        g = GeometrySTL3D("stl", False, cube_stl)
        assert g.pre_check_cell(CELLS.cell_outside_3D) is False

    def test_batched_check_cells(self, cube_stl):
        g = GeometrySTL3D("stl", False, cube_stl)
        cells = np.stack([CELLS.cell_outside_3D, CELLS.cell_partially_3D])
        res = np.asarray(g.check_cells(cells))
        assert res.tolist() == [False, False]


class TestFastWinding:
    """The two-level fast winding number (triangle bucket grid + far-field
    cluster dipoles) must classify inside/outside identically to the exact
    O(M·T) sweep."""

    @pytest.fixture(scope="class")
    def sphere_stl(self, tmp_path_factory):
        """A watertight ~5.7k-triangle sphere, radius 0.05 at
        (0.2, 0.2, 0.2). Small enough that the exact broadcast sweep is
        the production path — tests force the two-level structure by
        monkeypatching ``_FW_MIN_TRIS``."""
        import sys
        from os.path import dirname
        sys.path.insert(0, dirname(dirname(__file__)))
        from bench import synthetic_sphere_stl
        path = str(tmp_path_factory.mktemp("fw") / "sphere.stl")
        n = synthetic_sphere_stl(path, n_lat=60, n_lon=48)
        assert n >= 4096
        return path

    def test_matches_exact_and_analytic(self, sphere_stl):
        import jax.numpy as jnp
        from sparsespatialsampling_tpu.geometry import stl as S
        tris = S.read_stl(sphere_stl)
        fw = S.build_fast_winding(tris)

        rng = np.random.default_rng(4)
        far = rng.uniform([0, 0, 0], [0.6, 0.4, 0.4], size=(256, 3))
        rd = rng.normal(size=(256, 3))
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)
        near = 0.2 + rd * (0.05 * rng.uniform(0.9, 1.1, size=(256, 1)))
        inner = 0.2 + rd * (0.05 * rng.uniform(0.0, 0.85, size=(256, 1)))
        pts = np.concatenate([far, near, inner]).astype(np.float32)
        m = pts.shape[0]
        pad = -(-m // S._FW_CHUNK) * S._FW_CHUNK
        pp = np.zeros((pad, 3), np.float32)
        pp[:m] = pts
        w_fast = np.asarray(S._fast_winding(
            jnp.asarray(pp), fw["cell_tris"], fw["v0"], fw["v1"], fw["v2"],
            fw["resid"], fw["clus_cell"], fw["clus_cent"], fw["clus_an"],
            fw["origin"], fw["inv_h"], fw["dims"]))[:m]

        pad2 = -(-m // S._POINT_CHUNK) * S._POINT_CHUNK
        pp2 = np.zeros((pad2, 3), np.float32)
        pp2[:m] = pts
        w_exact = np.asarray(S._winding_number(
            jnp.asarray(pp2), jnp.asarray(tris[:, 0], jnp.float32),
            jnp.asarray(tris[:, 1], jnp.float32),
            jnp.asarray(tris[:, 2], jnp.float32)))[:m]

        np.testing.assert_array_equal(w_fast > 0.5, w_exact > 0.5)
        # analytic check only outside the faceting band: chords of the
        # triangulated sphere sag ~1e-4 below the true radius, so points in
        # that shell legitimately classify by the polyhedron, not the ball
        rr = np.linalg.norm(pts - [0.2, 0.2, 0.2], axis=1)
        off_band = np.abs(rr - 0.05) > 1e-3
        np.testing.assert_array_equal((w_fast > 0.5)[off_band],
                                      (rr < 0.05)[off_band])
        assert np.abs(w_fast - w_exact).max() < 0.05

    def test_geometry_uses_fast_path(self, sphere_stl, monkeypatch):
        from sparsespatialsampling_tpu.geometry import stl as S
        monkeypatch.setattr(S, "_FW_MIN_TRIS", 4096)
        g = GeometrySTL3D("sphere", False, sphere_stl)
        assert g._fw is not None
        pts = np.asarray([[0.2, 0.2, 0.2], [0.2, 0.2, 0.26],
                          [0.5, 0.3, 0.3], [0.2, 0.2, 0.249]])
        mask = np.asarray(g.mask_points(pts))
        assert mask.tolist() == [True, False, False, True]


class TestHoledSTL:
    """Graceful-degradation contract for NON-WATERTIGHT input (the
    reference repairs such meshes with pymeshfix,
    ``geometry_STL_3d.py:136-158``; this engine instead diagnoses the
    defect and degrades gracefully): the winding number of a holed surface
    is ``1 − Ω_hole/4π`` inside and ``−Ω_hole/4π`` outside, so the 0.5
    threshold stays correct for every query whose view of the hole
    subtends less than 2π — i.e. everywhere beyond ~the hole's own scale.
    A warning must name the defect so users know to repair the mesh when
    they need exactness near the hole."""

    @pytest.fixture(scope="class")
    def holed_sphere(self, tmp_path_factory):
        import sys
        from os.path import dirname
        sys.path.insert(0, dirname(dirname(__file__)))
        from bench import synthetic_sphere_stl
        from sparsespatialsampling_tpu.geometry.stl import (read_stl,
                                                            write_stl)
        tmp = tmp_path_factory.mktemp("holed")
        full = str(tmp / "full.stl")
        synthetic_sphere_stl(full, n_lat=60, n_lon=48)
        tris = read_stl(full)
        # punch a cap-shaped hole at the north pole: drop triangles whose
        # centroid lies above z = c_z + 0.96 r  (hole radius ~0.28 r)
        cent = tris.mean(axis=1)
        keep = cent[:, 2] < 0.2 + 0.96 * 0.05
        assert (~keep).sum() > 10
        holed = str(tmp / "holed.stl")
        write_stl(holed, tris[keep])
        return holed

    def test_warns_and_classifies_away_from_hole(self, holed_sphere,
                                                 caplog):
        import logging
        with caplog.at_level(logging.WARNING,
                             logger="sparsespatialsampling_tpu"):
            g = GeometrySTL3D("holed", False, holed_sphere)
        assert any("not closed/manifold" in r.message
                   for r in caplog.records)

        rng = np.random.default_rng(5)
        rd = rng.normal(size=(3000, 3))
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)
        radii = rng.uniform(0.0, 2.0, size=(3000, 1)) * 0.05
        pts = (0.2 + rd * radii).astype(np.float64)
        rr = np.linalg.norm(pts - 0.2, axis=1)
        # exclusion zones: the faceting band at the surface, and a ball of
        # twice the hole radius around the hole center (0.2, 0.2, 0.25)
        hole_c = np.asarray([0.2, 0.2, 0.25])
        d_hole = np.linalg.norm(pts - hole_c, axis=1)
        eval_mask = (np.abs(rr - 0.05) > 1e-3) & (d_hole > 2 * 0.014)
        got = np.asarray(g.mask_points(pts))
        np.testing.assert_array_equal(got[eval_mask],
                                      (rr < 0.05)[eval_mask])


class TestSignGrid:
    """The voxel sign grid answers far-from-surface queries with one int8
    gather; its classification must be indistinguishable from the exact
    winding sweep for EVERY query (near-band queries fall through to the
    exact path, so the combined result is exact everywhere)."""

    @pytest.fixture(scope="class")
    def sphere_geometry(self, tmp_path_factory):
        import sys
        from os.path import dirname
        sys.path.insert(0, dirname(dirname(__file__)))
        from bench import synthetic_sphere_stl
        path = str(tmp_path_factory.mktemp("sg") / "sphere.stl")
        synthetic_sphere_stl(path, n_lat=60, n_lon=48)
        return GeometrySTL3D("sphere", False, path)

    def test_grid_has_far_coverage(self, sphere_geometry):
        sg = sphere_geometry._sg
        # most voxels must be decided (only the surface band needs exact)
        assert sg["n_near_vox"] < sg["n_vox"]
        assert sg["n_near_vox"] > 0

    def test_mask_matches_exact_winding(self, sphere_geometry):
        import jax.numpy as jnp
        from sparsespatialsampling_tpu.geometry import stl as S
        g = sphere_geometry
        rng = np.random.default_rng(11)
        # inside, outside, and shell-straddling queries (sphere r=0.05 at
        # (0.2, 0.2, 0.2)), plus far out-of-grid points
        pts = np.concatenate([
            rng.uniform(0.1, 0.3, size=(4000, 3)),
            0.2 + rng.normal(size=(1000, 3)) * 0.05,
            rng.uniform(-2.0, 3.0, size=(200, 3)),
        ]).astype(np.float32)
        got = np.asarray(g.mask_points(pts))
        m = len(pts)
        pad = -(-m // S._POINT_CHUNK) * S._POINT_CHUNK
        pp = np.full((pad, 3), 1e6, np.float32)
        pp[:m] = pts
        w = np.asarray(S._winding_number(jnp.asarray(pp), g._v0, g._v1,
                                         g._v2))[:m]
        in_bbox = ((pts >= g._lower_bound) & (pts <= g._upper_bound)).all(-1)
        np.testing.assert_array_equal(got, (w > 0.5) & in_bbox)

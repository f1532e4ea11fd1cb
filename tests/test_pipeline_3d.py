"""3D end-to-end pipeline tests (octree path, k=26, hexahedral export)."""
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from sparsespatialsampling_tpu import (
    SparseSpatialSampling, ExportData, CubeGeometry, CylinderGeometry3D,
    SphereGeometry, GeometrySTL3D, Dataloader, write_svd_s_cube_to_file)
from sparsespatialsampling_tpu.geometry.stl import write_stl


@pytest.fixture(scope="module")
def cloud_3d():
    rng = np.random.default_rng(10)
    xyz = rng.uniform([0, 0, 0], [1, 1, 0.5], size=(20000, 3))
    r = np.linalg.norm(xyz[:, :2] - [0.3, 0.5], axis=1)
    keep = r > 0.1
    xyz = xyz[keep]
    metric = (np.exp(-np.maximum(xyz[:, 0] - 0.3, 0) / 0.5)
              * np.exp(-((xyz[:, 1] - 0.5) ** 2) / 0.05) + 0.02)
    return xyz, metric


@pytest.fixture(scope="module")
def executed_3d(cloud_3d, tmp_path_factory):
    xyz, metric = cloud_3d
    tmp = tmp_path_factory.mktemp("s3_3d")
    s3 = SparseSpatialSampling(
        xyz, metric,
        [CubeGeometry("domain", True, [0, 0, 0], [1, 1, 0.5]),
         CylinderGeometry3D("cyl", False, [[0.3, 0.5, 0.0], [0.3, 0.5, 0.5]], 0.1)],
        save_path=str(tmp), save_name="t3", uniform_levels=3, min_metric=0.7)
    s3.execute_grid_generation()
    return s3


class TestRefine3D:
    def test_grid_shapes(self, executed_3d):
        s3 = executed_3d
        n = s3.faces.shape[0]
        assert s3.faces.shape == (n, 8)       # hexahedra
        assert s3.centers.shape == (n, 3)
        assert s3.vertices.shape[1] == 3

    def test_faces_are_cell_corners(self, executed_3d):
        s3 = executed_3d
        corners = s3.vertices[s3.faces]       # [N, 8, 3]
        np.testing.assert_allclose(corners.mean(axis=1), s3.centers, atol=1e-9)
        h = s3.size_initial_cell / np.exp2(s3.levels.astype(float)).reshape(-1, 1)
        widths = corners.max(axis=1) - corners.min(axis=1)
        np.testing.assert_allclose(widths, np.repeat(h, 3, axis=-1), atol=1e-9)

    def test_nodes_deduplicated(self, executed_3d):
        nodes = executed_3d.vertices
        assert np.unique(np.round(nodes, 12), axis=0).shape[0] == nodes.shape[0]

    def test_no_cell_fully_inside_cylinder(self, executed_3d):
        s3 = executed_3d
        corners = s3.vertices[s3.faces]
        r = np.linalg.norm(corners[..., :2] - [0.3, 0.5], axis=-1)
        z = corners[..., 2]
        # corner strictly inside the cylinder = radially within AND within
        # the axial extent (cells touching the z-boundary are legal survivors)
        inside = (r < 0.1 - 1e-12) & (z > 1e-12) & (z < 0.5 - 1e-12)
        assert not inside.all(axis=1).any()

    def test_capture_target(self, executed_3d):
        m = executed_3d.data_final_mesh["metric_per_iter"]
        assert m[-1] >= 0.7 * 0.75 or abs(m[-1] - m[-2]) <= 1e-3 + 1e-9


class TestConstraints3D:
    def test_max_delta_level_constraint_3d(self, cloud_3d, tmp_path):
        """2:1 balance across ALL face/edge/corner-adjacent octree leaves
        (the reference's hardest 3D surface was its 26-neighbor topology)."""
        xyz, metric = cloud_3d
        s3 = SparseSpatialSampling(
            xyz, metric, [CubeGeometry("domain", True, [0, 0, 0], [1, 1, 0.5])],
            save_path=str(tmp_path), save_name="d3", uniform_levels=2,
            min_metric=0.7, max_delta_level=True)
        s3.execute_grid_generation()
        levels = s3.levels.squeeze()
        centers = s3.centers
        h = s3.size_initial_cell / np.exp2(levels.astype(float))
        from scipy.spatial import cKDTree
        tree = cKDTree(centers)
        pairs = tree.query_pairs(r=float(h.max()) * 1.8, output_type="ndarray")
        d = np.abs(centers[pairs[:, 0]] - centers[pairs[:, 1]])
        half_sum = ((h[pairs[:, 0]] + h[pairs[:, 1]]) / 2)[:, None]
        touching = (d <= half_sum + 1e-12).all(axis=1)
        adjacent = pairs[touching]
        dl = np.abs(levels[adjacent[:, 0]].astype(int)
                    - levels[adjacent[:, 1]].astype(int))
        assert len(adjacent) > 0
        assert dl.max() <= 1

    def test_pre_select_equivalent_grid_3d(self, cloud_3d, tmp_path):
        """pre_select is a pure optimization in 3D too: identical grids."""
        xyz, metric = cloud_3d
        grids = []
        for pre in (False, True):
            s3 = SparseSpatialSampling(
                xyz, metric,
                [CubeGeometry("domain", True, [0, 0, 0], [1, 1, 0.5]),
                 CylinderGeometry3D("cyl", False,
                                    [[0.3, 0.5, 0.0], [0.3, 0.5, 0.5]], 0.1)],
                save_path=str(tmp_path), save_name=f"ps{pre}",
                uniform_levels=3, min_metric=0.6, pre_select_cells=pre)
            s3.execute_grid_generation()
            grids.append((s3.centers, s3.levels, s3.faces))
        np.testing.assert_array_equal(grids[0][1], grids[1][1])
        np.testing.assert_allclose(grids[0][0], grids[1][0])
        np.testing.assert_array_equal(grids[0][2], grids[1][2])


class TestSTL3DEndToEnd:
    @pytest.fixture
    def box_stl(self, tmp_path):
        """Axis-aligned box STL obstacle centered in the domain."""
        lo, hi = np.asarray([0.55, 0.35, 0.15]), np.asarray([0.8, 0.65, 0.35])
        v = np.asarray([[x, y, z] for z in (lo[2], hi[2]) for y in (lo[1], hi[1])
                        for x in (lo[0], hi[0])], dtype=np.float64)
        faces = [(0, 2, 1), (1, 2, 3), (4, 5, 6), (5, 7, 6),
                 (0, 1, 4), (1, 5, 4), (2, 6, 3), (3, 6, 7),
                 (0, 4, 2), (2, 4, 6), (1, 3, 5), (3, 7, 5)]
        path = str(tmp_path / "box.stl")
        write_stl(path, np.stack([v[list(f)] for f in faces]))
        return path, lo, hi

    def test_stl_geometry_refinement_end_to_end(self, cloud_3d, box_stl,
                                                tmp_path):
        """Full pipeline with a GeometrySTL3D obstacle: cells inside the STL
        are removed and the surface is refined to the requested level, with
        pre_select exercising the bbox fast path."""
        path, lo, hi = box_stl
        xyz, metric = cloud_3d
        outside = ~np.logical_and(xyz >= lo, xyz <= hi).all(axis=1)
        s3 = SparseSpatialSampling(
            xyz[outside], metric[outside],
            [CubeGeometry("domain", True, [0, 0, 0], [1, 1, 0.5]),
             GeometrySTL3D("box", False, path, refine=True,
                           min_refinement_level=5)],
            save_path=str(tmp_path), save_name="stl3d", uniform_levels=2,
            min_metric=0.5, pre_select_cells=True)
        s3.execute_grid_generation()

        h = s3.size_initial_cell / np.exp2(
            s3.levels.astype(float)).reshape(-1, 1)
        corners = s3.vertices[s3.faces]
        # no surviving cell lies strictly inside the STL box
        eps = 1e-9
        strictly_inside = np.logical_and(corners > lo + eps,
                                         corners < hi - eps).all(-1)
        assert not strictly_inside.all(axis=1).any()
        # cells whose center is within half a cell of the box surface must
        # be refined to level >= 5
        c = s3.centers
        closest = np.clip(c, lo, hi)
        dist_out = np.linalg.norm(c - closest, axis=1)
        dist_in = np.minimum((c - lo).min(axis=1), (hi - c).min(axis=1))
        surf_dist = np.where(dist_out > 0, dist_out, np.abs(dist_in))
        near = surf_dist < 0.5 * h.squeeze()
        assert near.any()
        assert (s3.levels.squeeze()[near] >= 5).all()


    def test_stl_host_merged_route_equivalent(self, cloud_3d, box_stl,
                                              tmp_path, monkeypatch):
        """Forcing the STL above the fused-kernel table budget must route
        its validity through the eager host-merged path (epoch kernels
        trace only the cheap geometries, device loop disabled, geometry
        refinement on the host two-call route) and still produce the
        identical refined grid."""
        import sparsespatialsampling_tpu.engine.tree as tree_mod
        path, lo, hi = box_stl
        xyz, metric = cloud_3d
        outside = ~np.logical_and(xyz >= lo, xyz <= hi).all(axis=1)

        def run(tag):
            s3 = SparseSpatialSampling(
                xyz[outside], metric[outside],
                [CubeGeometry("domain", True, [0, 0, 0], [1, 1, 0.5]),
                 GeometrySTL3D("box", False, path, refine=True,
                               min_refinement_level=5)],
                save_path=str(tmp_path), save_name=f"hm_{tag}",
                uniform_levels=2, min_metric=0.5)
            s3.execute_grid_generation()
            return s3.centers, s3.levels, s3.faces

        ref = run("fused")
        monkeypatch.setattr(tree_mod, "_FUSED_GEO_BYTES", 0)
        alt = run("host")
        np.testing.assert_array_equal(ref[1], alt[1])
        np.testing.assert_allclose(ref[0], alt[0])
        np.testing.assert_array_equal(ref[2], alt[2])


class TestExport3D:
    def test_export_vector_field_and_svd(self, cloud_3d, executed_3d):
        xyz, metric = cloud_3d
        times = [f"{t:.2f}" for t in np.arange(6) * 0.1]
        rng = np.random.default_rng(11)
        # 3-component vector field with temporal oscillation
        snaps = (metric[:, None, None]
                 * (1 + 0.2 * np.sin(np.arange(6))[None, None, :])
                 * np.asarray([1.0, 0.5, 0.25])[None, :, None]).astype(np.float32)
        exp = ExportData(executed_3d, write_times=times)
        exp.export(xyz, snaps, "U", n_snapshots_total=6)

        dl = Dataloader(executed_3d.save_path, "t3.h5")
        snap = dl.load_snapshot("U")
        assert snap.shape == (dl.n_cells, 3, 6)
        # weights = (w0 / 2^level)^3
        h = dl.size_initial_cell / np.exp2(dl.levels.astype(float))
        np.testing.assert_allclose(dl.weights, h ** 3, rtol=1e-6)

        write_svd_s_cube_to_file("U", executed_3d.save_path, "t3",
                                 new_file=False, rank=4, n_modes=2)
        assert os.path.isfile(os.path.join(executed_3d.save_path, "t3_U_svd.h5"))

    def test_xdmf_hexahedron_topology(self, executed_3d):
        xdmf = os.path.join(executed_3d.save_path, "t3.xdmf")
        assert os.path.isfile(xdmf)
        tree = ET.parse(xdmf)
        topo = tree.find(".//Topology")
        assert topo.get("TopologyType") == "Hexahedron"

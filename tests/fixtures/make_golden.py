"""Generate ``s_cube_golden.h5`` — a reference-shaped S³ HDF5 fixture.

The file mimics the documented shape of the reference's committed test
dataset (``sparseSpatialSampling/tests/s_cube_test_dataset.h5``: 209 cells,
2D, one pressure field at t = 0.4; schema per reference ``const.py:5-17``
and ``tests/test_s_cube_dataloader.py:9-14``) but is generated from scratch
here: a 14 x 10 uniform quadtree slab (level 3) with the 23 highest-metric
cells split once (level 4), giving 140 - 23 + 92 = 209 cells.  It is written
with RAW h5py calls — deliberately NOT with the package's Datawriter — so
tests proving the package can consume it demonstrate schema interop with a
file the package did not produce.

Run from the repo root:  python tests/fixtures/make_golden.py
"""
import os

import numpy as np
import h5py

SIZE_INITIAL_CELL = 2.0   # root cell edge; level-3 cells have h = 0.25
BASE_LEVEL = 3
NX, NY = 14, 10


def build_grid():
    h = SIZE_INITIAL_CELL / 2 ** BASE_LEVEL
    # base cells as integer anchors on the level-4 lattice (2 units/cell)
    ix, iy = np.meshgrid(np.arange(NX), np.arange(NY), indexing="ij")
    anchors = np.stack([ix.ravel() * 2, iy.ravel() * 2], axis=1)
    levels = np.full(anchors.shape[0], BASE_LEVEL, dtype=np.int64)
    sizes = np.full(anchors.shape[0], 2, dtype=np.int64)  # in lattice units

    # refine the 23 cells closest to a synthetic "obstacle" at (1.4, 1.05)
    centers = (anchors + sizes[:, None] * 0.5) * (h / 2)
    dist = np.linalg.norm(centers - np.asarray([1.4, 1.05]), axis=1)
    refine = np.argsort(dist)[:23]

    keep = np.ones(anchors.shape[0], dtype=bool)
    keep[refine] = False
    child_offsets = np.asarray([[0, 0], [0, 1], [1, 1], [1, 0]])
    children = (anchors[refine][:, None, :] + child_offsets[None]).reshape(-1, 2)

    anchors = np.concatenate([anchors[keep], children])
    levels = np.concatenate([levels[keep],
                             np.full(children.shape[0], BASE_LEVEL + 1,
                                     dtype=np.int64)])
    sizes = np.concatenate([sizes[keep],
                            np.ones(children.shape[0], dtype=np.int64)])

    # corner nodes in (sw, nw, ne, se) order on the level-4 lattice
    corner_dirs = np.asarray([[0, 0], [0, 1], [1, 1], [1, 0]])
    corners = anchors[:, None, :] + corner_dirs[None] * sizes[:, None, None]
    flat = corners.reshape(-1, 2)
    # dedup topologically: lattice coordinates are exact integers
    key = flat[:, 0] * (2 * NY * 2 + 1) + flat[:, 1]
    unique_key, faces = np.unique(key, return_inverse=True)
    node_lattice = np.stack([unique_key // (2 * NY * 2 + 1),
                             unique_key % (2 * NY * 2 + 1)], axis=1)

    h4 = h / 2
    nodes = node_lattice.astype(np.float64) * h4
    centers = (anchors + sizes[:, None] * 0.5).astype(np.float64) * h4
    return (centers, nodes, faces.reshape(-1, 4).astype(np.int32),
            levels[:, None])


def main():
    centers, nodes, faces, levels = build_grid()
    n_cells, n_nodes = centers.shape[0], nodes.shape[0]
    print(f"cells={n_cells} nodes={n_nodes}")

    # smooth synthetic fields
    metric = np.exp(-np.sum((centers - [1.4, 1.05]) ** 2, axis=1) / 0.3)
    p_center = np.cos(2 * np.pi * centers[:, 0] / 3.5).astype(np.float32)
    p_vertices = np.cos(2 * np.pi * nodes[:, 0] / 3.5).astype(np.float32)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "s_cube_golden.h5")
    with h5py.File(out, "w") as f:
        grid = f.create_group("grid")
        grid.create_dataset("centers", data=centers)                 # f64
        grid.create_dataset("vertices", data=nodes)                  # f64
        grid.create_dataset("faces", data=faces)                     # i32
        const = f.create_group("constant")
        const.create_dataset("levels", data=levels)                  # i64 [N,1]
        const.create_dataset("metric", data=metric.astype(np.float64))
        const.create_dataset("size_initial_cell",
                             data=np.float64(SIZE_INITIAL_CELL))
        data = f.create_group("data")
        t = data.create_group("0.4")
        t.create_dataset("p_center", data=p_center)
        t.create_dataset("p_vertices", data=p_vertices)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""Reusable dummy cells for geometry predicate tests.

Truth tables mirror the reference test fixtures
(``sparseSpatialSampling/tests/const.py:7-69``): canonical cells fully inside,
fully outside, and partially overlapping the unit square / cube.
"""
import numpy as np


class DummyCells:
    def __init__(self) -> None:
        self.cell_inside_2D = np.asarray(
            [[0, 0], [0, 1], [1, 1], [1, 0]], dtype=np.float32)
        self.cell_outside_2D = np.asarray(
            [[5, 5], [6, 5], [6, 6], [5, 6]], dtype=np.float32)
        self.cell_partially_2D = np.asarray(
            [[0.5, 0.5], [0.5, 1.5], [1.5, 1.5], [1.5, 0.5]], dtype=np.float32)

        self.cell_inside_3D = np.asarray(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
             [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], dtype=np.float32)
        self.cell_outside_3D = np.asarray(
            [[5, 5, 5], [6, 5, 5], [6, 6, 5], [5, 6, 5],
             [5, 5, 6], [6, 5, 6], [6, 6, 6], [5, 6, 6]], dtype=np.float32)
        self.cell_partially_3D = np.asarray(
            [[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [1.5, 1.5, 0.5], [0.5, 1.5, 0.5],
             [0.5, 0.5, 1.5], [1.5, 0.5, 1.5], [1.5, 1.5, 1.5], [0.5, 1.5, 1.5]],
            dtype=np.float32)

    @property
    def cells_2D(self) -> dict:
        return {"inside": self.cell_inside_2D, "outside": self.cell_outside_2D,
                "partially": self.cell_partially_2D}

    @property
    def cells_3D(self) -> dict:
        return {"inside": self.cell_inside_3D, "outside": self.cell_outside_3D,
                "partially": self.cell_partially_3D}

"""Golden-grid regression anchor.

The oracle suite (test_oracle_parity) proves the engine matches the
reference ALGORITHM on small clouds; this test pins the engine against
ITSELF at a larger scale: a fixed 18k-point cloud with an obstacle,
geometry refinement to level 7 and the 2:1 constraint must always produce
the exact same cell set. Any semantic change to selection, stopping,
constraint expansion, geometry refinement or invalid-cell masking flips
the digest — updating it must be a conscious act that also re-runs the
oracle suite (which defines WHICH behavior is correct).
"""
import hashlib
import tempfile

import numpy as np

from sparsespatialsampling_tpu import (SparseSpatialSampling, CubeGeometry,
                                       SphereGeometry)

GOLDEN_N_CELLS = 3195
GOLDEN_CAPTURED = 0.674452
GOLDEN_DIGEST = \
    "87e4cc4d4cdbfa05ff935041d69c8c2519bada65229df8f55840b27513418e27"


def test_golden_grid_unchanged():
    rng = np.random.default_rng(42)
    xy = rng.uniform([0, 0], [1, 1], size=(20000, 2))
    r = np.linalg.norm(xy - [0.35, 0.5], axis=1)
    xy = xy[r > 0.08][:18000]
    metric = (np.exp(-((xy[:, 0] - .65) ** 2
                       + (xy[:, 1] - .45) ** 2) / .04) + 0.02)
    s3 = SparseSpatialSampling(
        xy, metric,
        [CubeGeometry("domain", True, [0, 0], [1, 1]),
         SphereGeometry("hole", False, [0.35, 0.5], 0.08,
                        refine=True, min_refinement_level=7)],
        save_path=tempfile.mkdtemp(), save_name="g", uniform_levels=4,
        n_cells_max=3000, max_delta_level=True)
    s3.execute_grid_generation()

    levels = np.asarray(s3.levels).ravel().astype(np.int64)
    centers = np.asarray(s3.centers)
    size = 1.0 / (2.0 ** levels)
    ij = np.rint(centers / size[:, None] - 0.5).astype(np.int64)
    key = np.lexsort((ij[:, 1], ij[:, 0], levels))
    blob = np.concatenate([levels[key], ij[key].ravel()]).tobytes()

    assert s3.faces.shape[0] == GOLDEN_N_CELLS
    np.testing.assert_allclose(
        float(s3.data_final_mesh["metric_per_iter"][-1]),
        GOLDEN_CAPTURED, atol=1e-4)
    assert hashlib.sha256(blob).hexdigest() == GOLDEN_DIGEST, (
        "the refinement semantics changed — if intentional, re-run the "
        "oracle parity suite first, then update the golden values")

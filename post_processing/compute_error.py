"""L2 error of S³-reduced fields vs the original CFD data.

Analog of the reference ``post_processing/compute_error_OAT.py``: interpolate
the S³ cell-center fields back onto the original grid with the same exact
k-NN/inverse-distance scheme and report the relative L2 error in space and
time.

Usage (library API):
    from post_processing.compute_error import l2_error_vs_original
    err = l2_error_vs_original(orig_coords, orig_data, s3_dir, "file.h5", "p")
"""
import numpy as np

from sparsespatialsampling_tpu import Dataloader
from sparsespatialsampling_tpu.ops.knn import KNNIndex
from sparsespatialsampling_tpu.ops.interpolate import interpolate_data


def l2_error_vs_original(orig_coords, orig_data, s3_dir: str, s3_file: str,
                         field: str, n_neighbors: int = None) -> dict:
    """Relative L2 errors between the original snapshots and the S³
    reconstruction back-interpolated onto the original grid.

    :param orig_coords: ``[N_orig, d]`` original grid coordinates
    :param orig_data: ``[N_orig, N_snap]`` original snapshots of the field
    :param s3_dir / s3_file: S³ HDF5 output
    :param field: field name in the file
    :return: dict with ``rel_l2_total``, ``rel_l2_per_snapshot`` and
        ``rel_l2_per_point``
    """
    orig_coords = np.asarray(orig_coords)
    orig_data = np.asarray(orig_data, dtype=np.float32)
    d = orig_coords.shape[1]
    k = n_neighbors if n_neighbors is not None else (8 if d == 2 else 26)

    loader = Dataloader(s3_dir, s3_file)
    s3_data = loader.load_snapshot(field)          # [N_cells, N_snap]
    centers = loader.vertices                       # cell centers

    index = KNNIndex(centers)
    w, idx = index.weights(orig_coords, min(k, centers.shape[0]))
    back = interpolate_data(np.asarray(w), np.asarray(idx),
                            s3_data[:, None, :])[:, 0, :]

    diff = back - orig_data
    denom = np.linalg.norm(orig_data)
    return {
        "rel_l2_total": float(np.linalg.norm(diff) / denom),
        "rel_l2_per_snapshot": (np.linalg.norm(diff, axis=0)
                                / np.maximum(np.linalg.norm(orig_data, axis=0), 1e-30)),
        "rel_l2_per_point": (np.linalg.norm(diff, axis=1)
                             / np.maximum(np.linalg.norm(orig_data, axis=1), 1e-30)),
    }

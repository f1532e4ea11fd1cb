"""Baseline SVD of the ORIGINAL (unreduced) CFD data, exported to HDF5/XDMF.

Analog of the reference ``post_processing/compute_svd_original_cylinder.py``:
compute the √(cell-area)-weighted SVD of a raw CFD snapshot matrix — i.e. on
the full original grid, *without* any S³ reduction — and write the modes,
mode coefficients, singular values, and cell areas into
``{save_name}_{field}_svd.h5`` (+XDMF, mixed topology) so they can be
compared mode-by-mode against the S³-grid SVD (``compare_svd.py``).

The heavy decomposition runs through the package's TPU SVD path
(``compute_svd``: exact thin SVD, or the randomized/distributed path above
the row threshold), replacing the reference's flowtorch ``SVD``.

Two input routes:
- OpenFOAM case via flowtorch (optional dependency, like the reference's
  ``FOAMDataloader``/``FOAM2HDF5`` route):
      python3 compute_svd_original.py foam <case_dir> <save_dir> <name> <field>
- Any HDF5 file in the S³ schema (grid + data groups):
      python3 compute_svd_original.py h5 <load_dir> <file.h5> <save_dir> <name> <field>
"""
import logging
import sys
from os import makedirs, path

import numpy as np

from sparsespatialsampling_tpu import Dataloader, compute_svd
from sparsespatialsampling_tpu.io.data import Datawriter
from sparsespatialsampling_tpu.io.const import CONST, GRID, FACES, CENTERS, VERTICES

logger = logging.getLogger(__name__)
logging.basicConfig(level=logging.INFO)


def write_svd_original(centers, vertices, faces, modes, mode_coefficients,
                       singular_values, cell_area, save_dir: str,
                       save_name: str, field_name: str, n_modes: int = 150,
                       mixed: bool = True) -> None:
    """Write a raw-grid SVD result in the same layout the reference's
    ``write_hfd5_for_svd`` produces (``compute_svd_original_cylinder.py:57-96``)."""
    if not path.exists(save_dir):
        makedirs(save_dir)
    dw = Datawriter(save_dir, f"{save_name}_{field_name}_svd.h5", mixed=mixed)

    dw.write_data(FACES, group=GRID, data=np.asarray(faces))
    dw.write_data(VERTICES, group=GRID, data=np.asarray(vertices))
    dw.write_data(CENTERS, group=GRID, data=np.asarray(centers))

    n_modes = min(n_modes, modes.shape[-1])
    for i in range(n_modes):
        if modes.ndim == 2:
            dw.write_data(f"mode_{i + 1}", group=CONST, data=modes[:, i])
        else:
            dw.write_data(f"mode_{i + 1}", group=CONST, data=modes[:, :, i])

    dw.write_data("V", group=CONST, data=np.asarray(mode_coefficients))
    dw.write_data("s", group=CONST, data=np.asarray(singular_values))
    dw.write_data("cell_area", group=CONST, data=np.asarray(cell_area))
    dw.write_xdmf_file()


def svd_original_from_h5(load_dir: str, file_name: str, save_dir: str,
                         save_name: str, field: str, rank: int = None,
                         n_modes: int = 150) -> None:
    """SVD of a field stored in any S³-schema HDF5 file, written back out in
    the raw-grid SVD layout."""
    loader = Dataloader(load_dir, file_name)
    data = loader.load_snapshot(field)
    s, u, v = compute_svd(data, loader.weights, rank=rank)
    write_svd_original(loader.vertices, loader.nodes, loader.faces, u, v, s,
                       loader.weights, save_dir, save_name, field,
                       n_modes=n_modes, mixed=False)


def svd_original_from_foam(case_dir: str, save_dir: str, save_name: str,
                           field: str, t_start: float = 0.0,
                           rank: int = None, n_modes: int = 150) -> None:
    """SVD of a raw OpenFOAM field (requires the optional flowtorch
    dependency, mirroring the reference's loader route)."""
    try:
        from flowtorch.data import FOAMDataloader
    except ImportError as e:
        raise ImportError(
            "The OpenFOAM route needs the optional dependency 'flowtorch'; "
            "use the 'h5' route or convert your data to the S³ HDF5 schema "
            "instead.") from e

    loader = FOAMDataloader(case_dir)
    times = [t for t in loader.write_times[1:] if float(t) >= t_start]
    cell_area = np.asarray(loader.weights)
    centers = np.asarray(loader.vertices)

    logger.info(f"Loading data matrix for field {field}.")
    data = np.asarray(loader.load_snapshot(field, times))

    logger.info(f"Performing SVD for field {field}.")
    s, u, v = compute_svd(data, cell_area, rank=rank)

    # no cell-to-node connectivity without a mesh converter: emit a
    # point-cloud grid (centers double as vertices; ParaView renders the
    # modes as point data)
    faces = np.arange(centers.shape[0], dtype=np.int64)[:, None]
    write_svd_original(centers, centers, faces, u, v, s, cell_area,
                       save_dir, save_name, field, n_modes=n_modes)


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    route = sys.argv[1]
    if route == "foam" and len(sys.argv) >= 6:
        svd_original_from_foam(*sys.argv[2:6])
    elif route == "h5" and len(sys.argv) >= 7:
        svd_original_from_h5(*sys.argv[2:7])
    else:
        sys.exit(__doc__)


if __name__ == "__main__":
    main()

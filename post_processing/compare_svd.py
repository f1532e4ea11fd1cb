"""Compare the weighted SVD of S³ results against the original-grid SVD.

Analog of the reference ``post_processing/compare_svd_OAT.py`` /
``compare_svd_cylinder3D_Re3900.py``: singular-value spectra, mode-coefficient
time series, and PSDs (via ``scipy.signal.welch``) for a field stored both on
the original grid (any HDF5 with the S³ schema) and on the S³ grid.

Usage:
    python3 compare_svd.py <s3_dir> <s3_file.h5> <field> [orig_dir orig_file]
"""
import sys

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from scipy.signal import welch

from sparsespatialsampling_tpu import Dataloader, compute_svd


def svd_of_file(load_dir: str, file_name: str, field: str, rank: int = 50):
    loader = Dataloader(load_dir, file_name)
    data = loader.load_snapshot(field)
    s, u, v = compute_svd(data, loader.weights, rank=rank)
    return s, u, v, loader


def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    s3_dir, s3_file, field = sys.argv[1:4]

    s, u, v, _ = svd_of_file(s3_dir, s3_file, field)
    results = {"s_cube": (s, v)}

    if len(sys.argv) >= 6:
        s0, u0, v0, _ = svd_of_file(sys.argv[4], sys.argv[5], field)
        results["original"] = (s0, v0)

    fig, axes = plt.subplots(1, 3, figsize=(15, 4.5))
    for label, (s_i, v_i) in results.items():
        energy = s_i ** 2 / (s_i ** 2).sum()
        axes[0].semilogy(np.arange(1, len(s_i) + 1), energy, "-o",
                         markersize=3, label=label)
        for mode in range(min(2, v_i.shape[1])):
            axes[1].plot(v_i[:, mode], label=f"{label} mode {mode + 1}")
        f, psd = welch(v_i[:, 0], nperseg=min(256, v_i.shape[0]))
        axes[2].semilogy(f, psd, label=label)

    axes[0].set_xlabel("mode"); axes[0].set_ylabel("normalized energy")
    axes[0].set_title("singular-value spectrum"); axes[0].legend()
    axes[1].set_xlabel("snapshot"); axes[1].set_title("mode coefficients")
    axes[1].legend(fontsize=7)
    axes[2].set_xlabel("normalized frequency"); axes[2].set_title("PSD of mode 1")
    axes[2].legend()
    fig.tight_layout()
    fig.savefig("svd_comparison.png", dpi=150)
    print("wrote svd_comparison.png")


if __name__ == "__main__":
    main()

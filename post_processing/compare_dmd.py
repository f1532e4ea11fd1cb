"""Compare DMD spectra of S³ results against an original-grid dataset.

Analog of the reference ``post_processing/compare_dmd_OAT.py`` (which uses
flowtorch's DMD); here the native exact DMD (``ops/dmd.py``) is used, so
the comparison runs without extra dependencies.

Usage:
    python3 compare_dmd.py <s3_dir> <s3_file.h5> <field> <dt> [orig_dir orig_file]
"""
import sys

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from sparsespatialsampling_tpu import Dataloader, compute_dmd


def dmd_of_file(load_dir: str, file_name: str, field: str, dt: float,
                rank: int = 30):
    loader = Dataloader(load_dir, file_name)
    data = loader.load_snapshot(field)
    return compute_dmd(data, cell_area=loader.weights, rank=rank, dt=dt)


def main():
    if len(sys.argv) < 5:
        sys.exit(__doc__)
    s3_dir, s3_file, field, dt = sys.argv[1:5]
    dt = float(dt)

    results = {"s_cube": dmd_of_file(s3_dir, s3_file, field, dt)}
    if len(sys.argv) >= 7:
        results["original"] = dmd_of_file(sys.argv[5], sys.argv[6], field, dt)

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    theta = np.linspace(0, 2 * np.pi, 200)
    axes[0].plot(np.cos(theta), np.sin(theta), "k--", lw=0.7)
    for label, res in results.items():
        ev = res["eigenvalues"]
        axes[0].scatter(ev.real, ev.imag, s=18, alpha=0.8, label=label)
        amp = np.abs(res["amplitudes"])
        pos = res["frequencies"] > 0
        axes[1].stem(res["frequencies"][pos], amp[pos] / max(amp.max(), 1e-30),
                     label=label, basefmt=" ")
    axes[0].set_xlabel(r"$\Re(\lambda)$"); axes[0].set_ylabel(r"$\Im(\lambda)$")
    axes[0].set_title("DMD eigenvalues"); axes[0].legend(); axes[0].set_aspect("equal")
    axes[1].set_xlabel("frequency [Hz]"); axes[1].set_ylabel("normalized amplitude")
    axes[1].set_title("DMD spectrum"); axes[1].legend()
    fig.tight_layout()
    fig.savefig("dmd_comparison.png", dpi=150)
    print("wrote dmd_comparison.png")


if __name__ == "__main__":
    main()

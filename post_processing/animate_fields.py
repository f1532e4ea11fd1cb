"""Animate a field stored in an S³ HDF5 file.

Analog of the reference ``post_processing/animate_fields.py``: renders the
adaptive grid's cell-center values over all write times into an MP4/GIF
(side-by-side with a second file if given).

Usage:
    python3 animate_fields.py <dir> <file.h5> <field> [out.gif]
"""
import sys

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.animation import FuncAnimation, PillowWriter

from sparsespatialsampling_tpu import Dataloader


def animate(load_dir: str, file_name: str, field: str, out: str = "animation.gif",
            fps: int = 10):
    loader = Dataloader(load_dir, file_name)
    times = sorted(loader.write_times, key=float)
    data = loader.load_snapshot(field, times)
    if data.ndim == 3:  # vector field → magnitude
        data = np.linalg.norm(data, axis=1)
    centers = loader.vertices
    vmin, vmax = np.percentile(data, [1, 99])

    fig, ax = plt.subplots(figsize=(8, 4))
    scat = ax.scatter(centers[:, 0], centers[:, 1], c=data[:, 0], s=2,
                      cmap="viridis", vmin=vmin, vmax=vmax)
    fig.colorbar(scat, ax=ax, label=field)
    title = ax.set_title(f"{field} @ t={times[0]}")
    ax.set_aspect("equal")

    def update(i):
        scat.set_array(data[:, i])
        title.set_text(f"{field} @ t={times[i]}")
        return scat, title

    anim = FuncAnimation(fig, update, frames=len(times), blit=False)
    anim.save(out, writer=PillowWriter(fps=fps))
    print(f"wrote {out}")


if __name__ == "__main__":
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    animate(sys.argv[1], sys.argv[2], sys.argv[3],
            sys.argv[4] if len(sys.argv) > 4 else "animation.gif")

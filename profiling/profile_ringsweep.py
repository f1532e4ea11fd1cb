"""Sweep _RING_PLAN configurations on the real c3d refine to find which
rescue passes dominate the in-loop epoch cost."""
import sys
import tempfile
import time

from profile_skeleton import build_tree


def run(sizes, tmp):
    from sparsespatialsampling_tpu.engine import tree as tree_mod
    old = tree_mod._RING_PLAN
    tree_mod._RING_PLAN = sizes
    try:
        tree = build_tree(True, tmp)
        t0 = time.perf_counter()
        tree.refine()
        wall = time.perf_counter() - t0
        split = tree.data_final_mesh["adaptive_split"]
        es = tree.data_final_mesh.get("epoch_stats") or {}
        per = split["t_epoch"] / max(split["n_iter"], 1)
        print(f"{str(sizes):20s}: refine {wall:6.2f}s  per-iter "
              f"{per * 1e3:6.1f} ms  n_iter {split['n_iter']}  "
              f"host-bad {es.get('n_bad_cells', '?')}  "
              f"calls m/r/f {es.get('n_calls_main', '?')}/"
              f"{es.get('n_calls_ring', '?')}/{es.get('n_calls_full', '?')}  "
              f"n_cells {tree.data_final_mesh['n_cells']}")
    finally:
        tree_mod._RING_PLAN = old


def main():
    tmp = tempfile.mkdtemp()
    for sizes in (((256, 2), (256, 4), (512, 4)),
                  ((512, 2), (256, 4)),
                  ((256, 4), (512, 4)),
                  ((256, 2), (512, 4))):
        run(tuple(sizes), tmp)


if __name__ == "__main__":
    main()

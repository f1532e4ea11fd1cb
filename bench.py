"""S³ end-to-end benchmark: refine + interpolate + weighted SVD.

Workloads (in priority order — later ones are skipped if the wall budget
runs out, earlier results are never lost):

1. **OAT15 2D (headline)** — mirror of the reference's tutorial-2
   configuration (``docs/source/tutorials/tutorial2_oat15_buffet.ipynb``:
   2D slice, ~245k original cells, ``n_cells_max=25_000``,
   ``uniform_levels=6``, an airfoil polygon with ``refine=True`` +
   ``pre_select``) on a synthetic transonic-buffet-like metric field.  The
   published reference timing for this exact configuration — INCLUDING its
   6.89 s geometry phase — is **26.93 s** (n_jobs=4, laptop-class CPU;
   BASELINE.md row 3).  On top of grid generation the bench interpolates 50
   snapshots of one scalar field and computes a rank-20 weighted SVD — the
   full pipeline of ``examples/s3_for_OAT15_airfoil.py``.

2. **cylinder3D Re=3900 (north-star)** — 3D octree over 500k points with a
   ``CylinderGeometry3D`` obstacle (``refine=True``) to ~150k cells, 50
   snapshots interpolated, rank-20 weighted SVD (mirrors
   ``examples/s3_for_cylinder3D_Re3900.py:101-140``).  The reference
   publishes no wall time for this case (it runs under an 8 h SLURM cap on
   72 cores); ``c3d_baseline_est_s`` is an EXTRAPOLATION, clearly labeled:
   OAT's 26.93 s at 29k cells/245k pts, scaled by cell count (x5.2) and a 3D
   per-cell factor (x2: 8 children, 26-point kNN) ≈ 280 s at n_jobs=4.

3. **cylinder2D metric-target** — the reference's tutorial-1 configuration
   (``min_metric=0.75`` stopping, sphere obstacle with
   ``min_refinement_level=9``; published 18.32 s, BASELINE.md row 2) so the
   *metric-mode* stopping criterion carries a driver-visible number too
   (the other workloads all use ``n_cells_max`` mode).

4. **STL obstacle** — 200k-point 3D cloud against a 51k-triangle STL
   (the reference's stated STL scale guidance).

5. **cylinder2D max_delta_level** — the reference's tutorial-3
   configuration (2:1 level constraint on, obstacle
   ``min_refinement_level=12``; published 11.56 s, BASELINE.md row 5) so
   the constraint path carries a driver-visible number.

6. **at-scale 2M-point 3D cloud** — the ``examples/s3_synthetic_large_scale``
   configuration (2M points → ~226k cells, 10k-cell iteration budgets):
   the scale regime where the reference OOMs (``README.md:186-200``) and
   where round 4's driver-invisible artifact showed a 45x per-cell
   regression (retry storm + host grid build).  Reports cells/s plus the
   full retry ledger so at-scale health stays driver-visible.

7. **gather roofline** — a one-off random-10KB-row gather microbench that
   measures this chip's achievable gather bandwidth, so each workload's
   ``*_epoch_gather_gbps`` can be reported as ``*_epoch_gather_pct_of_peak``.

Evidence protocol (the whole point of this file's structure): a full,
parseable JSON line — cumulative, same schema growing over time — is
printed IMMEDIATELY at startup and again after EVERY completed run, and
mirrored to the sidecar ``BENCH_partial.json``.  A watchdog thread
enforces a global wall budget (env ``S3_BENCH_BUDGET_S``, default 480 s):
when it expires, whatever has been measured is emitted one final time and
the process exits 0.  A tunnel stall can therefore delay results but can
never zero them out — the driver parses the LAST complete line.

Timing protocol per workload: the full pipeline runs twice — the first
run pays remote program loads plus the tunnel's first-readback channel
init (which can stall minutes); measured steady-state phases are 2-20x
faster than load-poisoned ones — BOTH raw e2e totals are reported
(`oat_run1/2_s`, ...) and the better run is broken down (the
grids/outputs are identical across runs).  Repeat runs are skipped when
the remaining budget would not cover them.
"""
import json
import os
import tempfile
import threading
import time

import numpy as np


BASELINE_REFINE_S = 26.93  # tutorial2 cell-10 output: 25k cells + geometry, n_jobs=4
C2D_BASELINE_S = 18.32  # tutorial1 cell-9 output: min_metric=0.75, n_jobs=4
MDL_BASELINE_S = 11.56  # tutorial3 cell-5 output: max_delta_level=True
C3D_BASELINE_EST_S = 280.0  # EXTRAPOLATED (see module docstring) — not published
# MXU peak of the one v5e chip this runs on, bf16. The epoch kernels run
# f32 with Precision.HIGHEST (multiple bf16 passes), so this denominator is
# an upper bound and the reported MFU a LOWER bound — these kernels are
# gather/HBM-bound by design, the honest headline is the gather GB/s
# (normalized against the measured roofline, workload 6).
V5E_BF16_PEAK_TFLOPS = 197.0

SIDECAR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_partial.json")


class Report:
    """Cumulative, always-parseable benchmark record.

    One JSON line per ``emit`` — each a superset of the last, so the last
    complete line on stdout is always the best available snapshot.  A
    daemon watchdog force-emits and exits 0 when the wall budget expires
    (os._exit is deliberate: it fires even while the main thread is stuck
    in an uninterruptible tunnel readback)."""

    def __init__(self, budget_s: float):
        self._lock = threading.Lock()
        self._t0 = time.perf_counter()
        self._cancelled = False
        self.budget_s = budget_s
        self.data = {
            "metric": ("oat15_2d e2e refine(25k cells + airfoil geometry)"
                       "+interp(50 snaps)+svd wall"),
            "value": -1.0, "unit": "s", "vs_baseline": 0.0,
            "budget_s": budget_s,
            "workloads_done": [],
            "note": "startup: no workload completed yet",
        }
        t = threading.Thread(target=self._watch, daemon=True)
        t.start()

    def cancel(self) -> None:
        """Disarm the watchdog (tests only — a live Report whose watchdog
        fires os._exit(0) would kill the HOST process, e.g. a pytest run,
        up to ``budget_s`` later)."""
        self._cancelled = True

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def remaining(self) -> float:
        return self.budget_s - self.elapsed()

    # Headline keys mirrored into the compact summary line.  The driver's
    # tail capture is ~2,000 chars and parses the LAST complete JSON line;
    # the full cumulative record outgrew that in round 4 (~4.5 KB →
    # ``parsed: null`` despite rc=0), so every emit now ALSO prints a
    # compact (<1 KB) line with just the per-workload headline numbers.
    _COMPACT_KEYS = (
        "metric", "value", "unit", "vs_baseline", "workloads_done",
        "oat_run1_s", "oat_run2_s", "captured_metric", "n_cells",
        "c3d_value_s", "c3d_refine_s",
        "c2d_value_s", "c2d_vs_baseline", "c2d_captured_metric",
        "stl_refine_s", "stl_n_calls_ring", "stl_n_calls_full",
        "mdl_value_s", "mdl_vs_baseline",
        "large_value_s", "large_cells_per_s", "large_n_calls_full",
        "large_knn_build_s",
        "gather_peak_gbps", "budget_exhausted", "error", "t_elapsed_s",
    )

    def _compact_line(self) -> str:
        out = {k: self.data[k] for k in self._COMPACT_KEYS
               if self.data.get(k) is not None}
        return json.dumps(out)

    def emit(self, **kv) -> None:
        with self._lock:
            self.data.update(kv)
            self.data["t_elapsed_s"] = round(self.elapsed(), 1)
            line = json.dumps(self.data)
            # full cumulative record first, compact summary LAST so the
            # driver's bounded tail always ends on a complete short line
            print(line, flush=True)
            print(self._compact_line(), flush=True)
            try:
                with open(SIDECAR, "w") as fh:
                    fh.write(line + "\n")
            except OSError:
                pass

    def done(self, name: str) -> None:
        done = list(self.data["workloads_done"]) + [name]
        self.emit(workloads_done=done,
                  note="completed: " + ",".join(done))

    def _watch(self) -> None:
        while not self._cancelled:
            rem = self.remaining()
            if rem <= 0:
                break
            time.sleep(min(rem, 5.0))
        if self._cancelled:
            return
        self.emit(budget_exhausted=True)
        os._exit(0)


def throughput_metrics(prefix: str, dfm: dict, exp_timings: dict) -> dict:
    """Derived observability metrics (queries/s, effective gather GB/s,
    score-stage FLOP/s + MFU estimate for the refinement epoch kernel;
    outputs/s + gather GB/s and the sub-phase split for the export path)."""
    out = {}
    es = dfm.get("epoch_stats") or {}
    w = es.get("wall_s", 0.0)
    if w > 0:
        out[f"{prefix}epoch_queries_per_s"] = round(es["queries"] / w, 1)
        out[f"{prefix}epoch_gather_gbps"] = round(
            es["gather_bytes"] / w / 1e9, 2)
        tf = es["flops"] / w / 1e12
        out[f"{prefix}epoch_tflops"] = round(tf, 4)
        out[f"{prefix}epoch_mfu_pct"] = round(
            100.0 * tf / V5E_BF16_PEAK_TFLOPS, 4)
    # retry-escalation ledger: how many device calls the epochs needed and
    # how much wall the host-driven escalations cost (the fused in-kernel
    # ring rescue should drive n_calls_ring/full and t_retry_s toward 0)
    for key in ("n_calls_main", "n_calls_ring", "n_calls_full",
                "n_bad_cells"):
        if key in es:
            out[f"{prefix}{key}"] = int(es[key])
    for key in ("t_retry_s", "t_dispatch_s", "t_readback_s"):
        if key in es:
            out[f"{prefix}{key}"] = round(es[key], 3)
    tk = exp_timings.get("t_kernel", 0.0)
    if tk > 0:
        out[f"{prefix}interp_outputs_per_s"] = round(
            exp_timings.get("interp_outputs", 0) / tk, 1)
        out[f"{prefix}interp_gather_gbps"] = round(
            exp_timings.get("interp_bytes", 0.0) / tk / 1e9, 2)
    if exp_timings:
        for key in ("t_weights", "t_upload", "t_metric", "t_kernel",
                    "t_readback", "t_h5"):
            out[f"{prefix}{key}"] = round(exp_timings.get(key, 0.0), 3)
        out[f"{prefix}n_fallback"] = exp_timings.get("n_fallback", 0)
    return out


def airfoil_polygon(n: int = 240) -> np.ndarray:
    """NACA-0012-like closed profile on chord [0, 1] (synthetic OAT stand-in)."""
    xc = (1 - np.cos(np.linspace(0.0, np.pi, n // 2))) / 2
    t = 0.12
    yt = 5 * t * (0.2969 * np.sqrt(xc) - 0.1260 * xc - 0.3516 * xc ** 2
                  + 0.2843 * xc ** 3 - 0.1036 * xc ** 4)
    upper = np.stack([xc, yt], axis=1)
    lower = np.stack([xc[::-1], -yt[::-1]], axis=1)
    return np.concatenate([upper, lower[1:-1]])


def synthetic_oat15(n_points: int = 245_000, seed: int = 0):
    """Synthetic 2D transonic-buffet-like field: thin high-gradient shock
    region + wake turbulence behind the airfoil + a broadband turbulence
    texture; no points inside the airfoil (as in the real CFD mesh).

    The texture/background amplitudes are CALIBRATED so the captured-metric
    fraction at ``n_cells_max=25_000`` matches the reference's published
    tutorial-2 statistics: 56.4 % captured / 27,084 cells here vs the
    reference's 56.29 % / 28,919 cells (``tutorial2_oat15_buffet.ipynb``
    cell 10) — the compression-vs-information tradeoff of the synthetic
    workload mirrors the real OAT15A dataset, not just its shape/size."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform([-0.5, -0.5], [1.5, 0.5], size=(int(n_points * 1.02), 2))
    poly = airfoil_polygon()
    # drop points inside the airfoil (vectorized even-odd crossing test)
    x, y = xy[:, 0:1], xy[:, 1:2]
    x1, y1 = poly[:-1, 0][None], poly[:-1, 1][None]
    x2, y2 = poly[1:, 0][None], poly[1:, 1][None]
    straddle = (y1 > y) != (y2 > y)
    xcross = (x2 - x1) * (y - y1) / np.where(y2 == y1, 1.0, y2 - y1) + x1
    inside = (np.sum(straddle & (x < xcross), axis=1) % 2) == 1
    xy = xy[~inside][:n_points]
    x, y = xy[:, 0], xy[:, 1]
    # shock: steep std(Ma) ridge at x ~ 0.45 above the airfoil
    shock = np.exp(-((x - 0.45) ** 2) / 0.002) * np.exp(-(y - 0.05) ** 2 / 0.01)
    # wake: decaying fluctuation region downstream
    wake = (x > 0.9) * np.exp(-(x - 0.9) / 0.4) * np.exp(-y ** 2 / 0.02)
    # broadband turbulence texture (sum of random smooth waves): spreads
    # metric energy outside the refinable structures the way the real
    # buffet field does — the amplitudes land the captured-metric fraction
    # on the reference's published value (see docstring)
    tex = np.zeros_like(x)
    trng = np.random.default_rng(7)
    for _ in range(12):
        kx, ky = trng.uniform(4, 40, 2)
        ph = trng.uniform(0, 2 * np.pi, 2)
        tex += np.sin(kx * x + ph[0]) * np.sin(ky * y + ph[1])
    metric = (shock + 0.6 * wake + 0.071 * np.abs(tex) / 12
              + 0.05).astype(np.float64)
    return xy, metric, poly


def run_refine_oat(xy, metric, poly, tmp, name):
    from sparsespatialsampling_tpu import (
        SparseSpatialSampling, CubeGeometry, GeometryCoordinates2D)
    geometries = [
        CubeGeometry("domain", True, [-0.5, -0.5], [1.5, 0.5]),
        GeometryCoordinates2D("airfoil", False, poly, refine=True),
    ]
    t0 = time.perf_counter()
    s3 = SparseSpatialSampling(
        xy, metric, geometries, save_path=tmp, save_name=name,
        uniform_levels=6, n_cells_max=25_000, pre_select_cells=True)
    t_init = time.perf_counter() - t0
    s3.execute_grid_generation()
    return s3, t_init, time.perf_counter() - t0


def synthetic_cylinder3d(n_points: int = 500_000, seed: int = 1):
    bounds = [[0.0, 0.0, 0.0], [2.2, 0.41, 0.41]]
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(bounds[0], bounds[1], size=(int(n_points * 1.01), 3))
    r = np.linalg.norm(xyz[:, :2] - [0.2, 0.2], axis=1)
    xyz = xyz[r > 0.05][:n_points]
    x, y, z = xyz.T
    # TKE-like wake metric behind the cylinder
    metric = ((x > 0.2) * np.exp(-np.maximum(x - 0.25, 0) / 0.8)
              * np.exp(-((y - 0.2) ** 2) / 0.02) + 0.01).astype(np.float64)
    return xyz, metric, bounds


def run_cylinder3d(tmp):
    from sparsespatialsampling_tpu import (
        SparseSpatialSampling, ExportData, CubeGeometry, CylinderGeometry3D,
        write_svd_s_cube_to_file)
    xyz, metric, bounds = synthetic_cylinder3d()
    geometries = [
        CubeGeometry("domain", True, bounds[0], bounds[1]),
        CylinderGeometry3D("cylinder", False,
                           [[0.2, 0.2, 0.0], [0.2, 0.2, 0.41]], 0.05,
                           refine=True, min_refinement_level=7),
    ]
    t0 = time.perf_counter()
    s3 = SparseSpatialSampling(
        xyz, metric, geometries, save_path=tmp, save_name="c3d",
        uniform_levels=5, n_cells_max=150_000)
    s3.execute_grid_generation()
    t_refine = time.perf_counter() - t0

    n_snap = 50
    phases = np.linspace(0, 2 * np.pi, n_snap, endpoint=False)
    snaps = (metric[:, None]
             * (1 + 0.2 * np.sin(phases)[None, :])).astype(np.float32)
    times = [f"{t:.4f}" for t in np.arange(n_snap) * 5e-4]

    t1 = time.perf_counter()
    exp = ExportData(s3, write_times=times)
    exp.export(xyz, snaps[:, None, :], "k", n_snapshots_total=n_snap)
    t_interp = time.perf_counter() - t1

    t2 = time.perf_counter()
    write_svd_s_cube_to_file("k", tmp, "c3d", new_file=False, rank=20,
                             n_modes=5)
    t_svd = time.perf_counter() - t2
    from sparsespatialsampling_tpu.utils import last_svd_timings
    return s3, t_refine, t_interp, t_svd, exp.timings, dict(last_svd_timings)


def synthetic_cylinder2d(n_points: int = 25_000, seed: int = 3,
                         calibrated: bool = False):
    """Synthetic cylinder2D Re=100 stand-in (tutorial-1 scale): wake-like
    time-mean |U| metric behind a cylinder at (0.2, 0.2), r=0.05 in the
    standard 2.2 x 0.41 channel.

    With ``calibrated=True`` the field additionally carries a
    sub-cell-scale ± component CALIBRATED so the tutorial-1 configuration
    (``min_metric=0.75``) STALLS via relTol at ~56.5 % captured, matching
    the reference's published run (56.56 %, tutorial1 cell 9) instead of
    reaching the 0.75 target: Morton-adjacent point pairs get +a/−a of the
    same magnitude, so the energy is real (it lowers the captured-metric
    ceiling to ~0.566) yet cancels in any cell-scale IDW average — the
    refinement hits a hard floor just above the relTol arming threshold
    (0.75·0.75 = 0.5625) and the |Δcaptured| ≤ 1e-3 stall fires.  This is
    the regime the reference's arming logic (``s_cube.py:263-284``)
    actually exercises on its tutorial data."""
    bounds = [[0.0, 0.0], [2.2, 0.41]]
    rng = np.random.default_rng(seed)
    xy = rng.uniform(bounds[0], bounds[1], size=(int(n_points * 1.02), 2))
    r = np.linalg.norm(xy - [0.2, 0.2], axis=1)
    xy = xy[r > 0.05][:n_points]
    x, y = xy.T
    wake = ((x > 0.2) * np.exp(-np.maximum(x - 0.25, 0.0) / 0.6)
            * (np.exp(-((y - 0.2) ** 2) / 0.01)
               + 0.4 * np.cos(12.0 * (x - 0.25))
               * np.exp(-((y - 0.2) ** 2) / 0.02)))
    metric = (np.abs(wake) + 0.02).astype(np.float64)
    if calibrated:
        from sparsespatialsampling_tpu.ops import morton
        lo, ext = xy.min(0), xy.max(0) - xy.min(0)
        depth = morton.MAX_DEPTH[2]
        grid = np.clip(((xy - lo) / ext * ((1 << depth) - 1))
                       .astype(np.uint64), 0, (1 << depth) - 1)
        order = np.argsort(morton.encode(grid), kind="stable")
        nrng = np.random.default_rng(42)
        n = len(xy)
        a = np.repeat(np.abs(nrng.standard_normal(n // 2 + 1)), 2)[:n]
        sgn = np.tile([1.0, -1.0], n // 2 + 1)[:n]
        pm = np.empty(n)
        pm[order] = a * sgn
        # noise/wake energy ratio 1.4 → captured floor ≈ 0.566 (measured
        # 0.5652 at stall); 1.452 would put the floor exactly at
        # 1/sqrt(1+r²)=0.567 but leaves no margin above the 0.5625 arming
        # threshold for platform-level interpolation differences
        b = 1.40 * np.sqrt((metric ** 2).sum() / (pm ** 2).sum())
        metric = np.maximum(metric + b * pm, 0.004)
    return xy, metric, bounds


def run_cylinder2d_metric(tmp, max_delta_level=False):
    """Tutorial-1 config (metric-target stopping) or, with
    ``max_delta_level=True``, the tutorial-3 config (2:1 constraint +
    obstacle min_refinement_level=12, ~50% target)."""
    from sparsespatialsampling_tpu import (
        SparseSpatialSampling, CubeGeometry, SphereGeometry)
    # tutorial-1 runs the relTol-STALL-calibrated field (see
    # synthetic_cylinder2d); tutorial-3 keeps the clean wake — it measures
    # the 2:1 constraint path and reaches its 0.5 target
    xy, metric, bounds = synthetic_cylinder2d(
        calibrated=not max_delta_level)
    level = 12 if max_delta_level else 9
    geometries = [
        CubeGeometry("domain", True, bounds[0], bounds[1]),
        SphereGeometry("cylinder", False, [0.2, 0.2], 0.05,
                       refine=True, min_refinement_level=level),
    ]
    t0 = time.perf_counter()
    # this workload never exports: skip the speculative export weight-cache
    # prefetch — on this single-CPU host its worker thread contends with
    # the checkpoint pickling inside the timed window
    saved_prefetch = os.environ.get("S3_TPU_EXPORT_PREFETCH")
    os.environ["S3_TPU_EXPORT_PREFETCH"] = "0"
    try:
        s3 = SparseSpatialSampling(
            xy, metric, geometries, save_path=tmp,
            save_name="mdl" if max_delta_level else "c2d",
            uniform_levels=5,
            min_metric=0.5 if max_delta_level else 0.75,
            max_delta_level=max_delta_level)
        s3.execute_grid_generation()
    finally:
        if saved_prefetch is None:
            os.environ.pop("S3_TPU_EXPORT_PREFETCH", None)
        else:
            os.environ["S3_TPU_EXPORT_PREFETCH"] = saved_prefetch
    t_refine = time.perf_counter() - t0
    return s3, t_refine


def synthetic_sphere_stl(path: str, n_lat: int = 180, n_lon: int = 144):
    """Write a ~5e4-triangle closed sphere STL (the reference's stated STL
    scale, ``README.md:202-208`` / ``geometry_STL_3d.py:161-166``): interior
    lat rings as quad pairs, pole caps as fans, seam shared by index wrap so
    shared vertices are bit-identical (keeps the mesh watertight)."""
    from sparsespatialsampling_tpu.geometry.stl import write_stl
    r, c0 = 0.05, np.asarray([0.2, 0.2, 0.2])
    th = np.linspace(0.0, np.pi, n_lat + 1)[1:-1]          # interior rings
    ph = np.arange(n_lon) / n_lon * 2.0 * np.pi            # no seam dup
    t, p = np.meshgrid(th, ph, indexing="ij")
    ring = np.stack([r * np.sin(t) * np.cos(p),
                     r * np.sin(t) * np.sin(p),
                     r * np.cos(t)], axis=-1) + c0         # [R, L, 3]
    ring = ring.astype(np.float32)
    nxt = np.roll(np.arange(n_lon), -1)
    top = (c0 + [0, 0, r]).astype(np.float32)
    bot = (c0 - [0, 0, r]).astype(np.float32)
    tris = [np.stack([np.broadcast_to(top, (n_lon, 3)),
                      ring[0], ring[0][nxt]], axis=1),
            np.stack([np.broadcast_to(bot, (n_lon, 3)),
                      ring[-1][nxt], ring[-1]], axis=1)]
    a, b = ring[:-1], ring[1:]
    tris.append(np.stack([a, b, b[:, nxt]], axis=2).reshape(-1, 3, 3))
    tris.append(np.stack([a, b[:, nxt], a[:, nxt]], axis=2).reshape(-1, 3, 3))
    tris = np.concatenate(tris)
    write_stl(path, tris)
    return tris.shape[0]


def run_stl(tmp):
    """STL workload: 200k-point 3D cloud refined against a 51k-triangle STL
    obstacle (surface refinement on) — proves the full-evaluation-per-epoch
    decision (engine/tree.py fused geometry check) at the reference's STL
    scale guidance."""
    from sparsespatialsampling_tpu import (
        SparseSpatialSampling, CubeGeometry, GeometrySTL3D)
    stl_path = os.path.join(tmp, "sphere.stl")
    n_tri = synthetic_sphere_stl(stl_path)
    bounds = [[0.0, 0.0, 0.0], [0.6, 0.4, 0.4]]
    rng = np.random.default_rng(2)
    xyz = rng.uniform(bounds[0], bounds[1], size=(220_000, 3))
    rr = np.linalg.norm(xyz - [0.2, 0.2, 0.2], axis=1)
    xyz = xyz[rr > 0.05][:200_000]
    metric = (np.exp(-np.maximum(np.linalg.norm(
        xyz - [0.2, 0.2, 0.2], axis=1) - 0.05, 0) / 0.1) + 0.01)
    geometries = [
        CubeGeometry("domain", True, bounds[0], bounds[1]),
        GeometrySTL3D("sphere", False, stl_path, refine=True,
                      min_refinement_level=6),
    ]
    t0 = time.perf_counter()
    # this workload never exports: skip the speculative export weight-cache
    # prefetch (its worker thread contends with the checkpoint pickling on
    # this single-CPU host, and its device work with the next timed run)
    saved_prefetch = os.environ.get("S3_TPU_EXPORT_PREFETCH")
    os.environ["S3_TPU_EXPORT_PREFETCH"] = "0"
    try:
        s3 = SparseSpatialSampling(
            xyz, metric, geometries, save_path=tmp, save_name="stl",
            uniform_levels=4, n_cells_max=40_000)
        s3.execute_grid_generation()
    finally:
        if saved_prefetch is None:
            os.environ.pop("S3_TPU_EXPORT_PREFETCH", None)
        else:
            os.environ["S3_TPU_EXPORT_PREFETCH"] = saved_prefetch
    t_refine = time.perf_counter() - t0
    return s3, n_tri, t_refine


def run_large(tmp, n_points: int = 2_000_000):
    """At-scale workload: the ``examples/s3_synthetic_large_scale.py``
    refinement configuration (2M-point synthetic turbulent-wake cloud in a
    [4, 1, 1] domain, 200k-cell target, 10k-cell iteration budgets)."""
    from sparsespatialsampling_tpu import SparseSpatialSampling, CubeGeometry
    rng = np.random.default_rng(0)
    xyz = rng.uniform([0, 0, 0], [4, 1, 1],
                      size=(n_points, 3)).astype(np.float32)
    metric = (np.exp(-np.maximum(xyz[:, 0] - 0.5, 0))
              * np.exp(-((xyz[:, 1] - 0.5) ** 2
                         + (xyz[:, 2] - 0.5) ** 2) / 0.1)
              + 0.01).astype(np.float64)
    saved_prefetch = os.environ.get("S3_TPU_EXPORT_PREFETCH")
    os.environ["S3_TPU_EXPORT_PREFETCH"] = "0"
    try:
        t0 = time.perf_counter()
        # iteration budget 2000: the largest per-iteration budget whose
        # device-loop program shape is TPU-validated at this scale (the
        # while-ring epoch core crashes the worker inside longer per-
        # iteration lax.maps — see _device_adaptive_call's 2-block bound);
        # bigger budgets fall back to host epochs, which cost one round
        # trip per iteration
        s3 = SparseSpatialSampling(
            xyz, metric,
            [CubeGeometry("domain", True, [0, 0, 0], [4, 1, 1])],
            save_path=tmp, save_name="large",
            uniform_levels=4, n_cells_max=200_000,
            n_cells_iter_start=2000)
        s3.execute_grid_generation()
        t_refine = time.perf_counter() - t0
    finally:
        if saved_prefetch is None:
            os.environ.pop("S3_TPU_EXPORT_PREFETCH", None)
        else:
            os.environ["S3_TPU_EXPORT_PREFETCH"] = saved_prefetch
    return s3, t_refine


def emit_large(rep: Report, runs) -> None:
    totals = [r[1] for r in runs]
    best = int(np.argmin(totals))
    s3, t_refine = runs[best]
    dfm = s3.data_final_mesh
    out = {
        **_runs_dict("large", totals),
        "large_value_s": round(totals[best], 3),
        "large_n_cells": int(s3.faces.shape[0]),
        "large_cells_per_s": round(s3.faces.shape[0] / t_refine, 1),
        "large_init_s": round(dfm["t_init"], 3),
        "large_knn_build_s": round(dfm["t_knn_build"], 3),
        "large_uniform_s": round(dfm["t_uniform"], 3),
        "large_adaptive_s": round(dfm["t_adaptive"], 3),
        "large_renumber_s": round(dfm["t_renumbering"], 3),
        "large_checkpoint_s": round(dfm["t_checkpoint"], 3),
    }
    out.update(throughput_metrics("large_", dfm, {}))
    rep.emit(**out)


def gather_roofline(n_rows: int = 36_864, row_f32: int = 2_560,
                    iters: int = 8) -> float:
    """Measured achievable gather bandwidth for the epoch kernel's access
    pattern (random ~10 KB rows out of a ~378 MB table), GB/s.

    Iterations are chained through a data dependency (the next index
    offset depends on the previous gather's result) and synced ONCE via a
    scalar ``device_get`` — ``block_until_ready`` does not reliably sync
    through the axon tunnel and unchained loops report impossible
    numbers (see CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    table = jnp.ones((n_rows, row_f32), jnp.float32)
    idx0 = jnp.asarray(np.random.default_rng(0).permutation(n_rows),
                       jnp.int32)

    @jax.jit
    def run(table, idx):
        def body(carry, _):
            idx, acc = carry
            g = jnp.take(table, idx, axis=0)
            row0 = g[:, 0]
            nxt = (idx + row0[0].astype(jnp.int32)) % n_rows
            return (nxt, acc + row0.sum()), None
        (_, acc), _ = lax.scan(body, (idx, jnp.float32(0)), None,
                               length=iters)
        return acc

    float(jax.device_get(run(table, idx0)))  # compile + channel warm
    t0 = time.perf_counter()
    float(jax.device_get(run(table, idx0)))
    dt = time.perf_counter() - t0
    return n_rows * row_f32 * 4 * iters / dt / 1e9


def warmup_tunnel():
    """One tiny dispatch + readback before any timed work: absorbs the
    tunnel's first-readback channel-init stall (30 ms … 340+ s, purely
    environmental) so ``t_refine_run1`` measures compile-cache
    effectiveness instead of channel health.  Returns the stall it ate."""
    import jax.numpy as jnp
    t0 = time.perf_counter()
    float(jnp.ones((8, 8)).sum())
    return time.perf_counter() - t0


def probe_backend(timeout_s: float) -> float:
    """Check in a SUBPROCESS that the jax backend actually initializes;
    returns the init wall seconds (-1.0 on timeout).

    When the TPU tunnel is down, ``jax.devices()`` hangs indefinitely
    inside this process (uninterruptible); probing in a child process lets
    the bench emit a parseable failure record instead of hanging until the
    watchdog fires.  One attempt only — the old 3 x 570 s retry loop could
    silently eat the entire driver budget before any workload ran."""
    import subprocess
    import sys
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        if r.returncode == 0:
            return time.perf_counter() - t0
    except subprocess.TimeoutExpired:
        pass
    return -1.0


def _runs_dict(prefix: str, totals, extras=None) -> dict:
    out = {f"{prefix}_run{i + 1}_s": round(t, 3)
           for i, t in enumerate(totals)}
    if extras:
        out.update(extras)
    return out


def emit_oat(rep: Report, oat_runs) -> tuple:
    """Cumulative OAT fields from all runs so far; returns (s3, exp) of
    the best run for downstream use."""
    totals = [sum(r[3:6]) for r in oat_runs]
    refines = [r[3] for r in oat_runs]
    best = int(np.argmin(totals))
    s3, exp, t_init, t_refine, t_interp, t_svd, svd_t = oat_runs[best]
    out = {
        "value": round(totals[best], 3),
        "vs_baseline": round(BASELINE_REFINE_S / min(refines), 3),
        **_runs_dict("oat", totals),
        **{f"t_refine_run{i + 1}_s": round(t, 3)
           for i, t in enumerate(refines)},
        "t_refine_s": round(t_refine, 3),
        "t_init_s": round(t_init, 3),
        "t_uniform_s": round(s3.data_final_mesh["t_uniform"], 3),
        "t_adaptive_s": round(s3.data_final_mesh["t_adaptive"], 3),
        "t_geometry_s": (round(s3.data_final_mesh["t_geometry"], 3)
                         if s3.data_final_mesh["t_geometry"] else None),
        "t_interp_s": round(t_interp, 3),
        "t_svd_s": round(t_svd, 3),
        # SVD sub-phases: HDF5 reads / compute_svd / mode+grid+XDMF writes
        **{f"t_svd_{k[2:]}_s": round(v, 3) for k, v in svd_t.items()},
        "n_cells": int(s3.faces.shape[0]),
        "captured_metric": round(
            float(s3.data_final_mesh["metric_per_iter"][-1]), 4),
        "baseline_refine_s": BASELINE_REFINE_S,
    }
    out.update(throughput_metrics("", s3.data_final_mesh, exp.timings))
    rep.emit(**out)
    return s3, exp


def emit_c3d(rep: Report, runs) -> None:
    totals = [r[1] + r[2] + r[3] for r in runs]
    best = int(np.argmin(totals))
    c3d, c3d_refine, c3d_interp, c3d_svd, c3d_exp_t, c3d_svd_t = runs[best]
    out = {
        **_runs_dict("c3d", totals),
        "c3d_value_s": round(totals[best], 3),
        "c3d_refine_s": round(c3d_refine, 3),
        "c3d_interp_s": round(c3d_interp, 3),
        "c3d_svd_s": round(c3d_svd, 3),
        **{f"c3d_svd_{k[2:]}_s": round(v, 3) for k, v in c3d_svd_t.items()},
        "c3d_uniform_s": round(c3d.data_final_mesh["t_uniform"], 3),
        "c3d_adaptive_s": round(c3d.data_final_mesh["t_adaptive"], 3),
        "c3d_geometry_s": (round(c3d.data_final_mesh["t_geometry"], 3)
                           if c3d.data_final_mesh["t_geometry"] else None),
        # full ledger: c3d_refine_s == init + uniform + adaptive + geometry
        # + renumber + finalize + checkpoint (to within noise)
        "c3d_init_s": round(c3d.data_final_mesh["t_init"], 3),
        "c3d_knn_build_s": round(c3d.data_final_mesh["t_knn_build"], 3),
        "c3d_renumber_s": round(c3d.data_final_mesh["t_renumbering"], 3),
        "c3d_finalize_s": round(c3d.data_final_mesh["t_finalize"], 3),
        "c3d_checkpoint_s": round(c3d.data_final_mesh["t_checkpoint"], 3),
        "c3d_n_cells": int(c3d.faces.shape[0]),
        "c3d_captured_metric": round(
            float(c3d.data_final_mesh["metric_per_iter"][-1]), 4),
        "c3d_cells_per_s": round(c3d.faces.shape[0] / c3d_refine, 1),
        "c3d_baseline_est_s": C3D_BASELINE_EST_S,
        "c3d_vs_baseline_est": round(C3D_BASELINE_EST_S / totals[best], 2),
    }
    out.update(throughput_metrics("c3d_", c3d.data_final_mesh, c3d_exp_t))
    # adaptive-loop attribution: host selection vs device epoch wall
    for k, v in (c3d.data_final_mesh.get("adaptive_split") or {}).items():
        out[f"c3d_adaptive_{k}"] = v
    # renumber attribution: host unique/scatter vs HDF5-side costs
    for k, v in (c3d.data_final_mesh.get("renumber_split") or {}).items():
        out[f"c3d_renumber_{k}"] = v
    rep.emit(**out)


def emit_c2d(rep: Report, runs, prefix: str, baseline_s: float) -> None:
    totals = [r[1] for r in runs]
    best = int(np.argmin(totals))
    s3, t_refine = runs[best]
    out = {
        **_runs_dict(prefix, totals),
        f"{prefix}_value_s": round(totals[best], 3),
        f"{prefix}_n_cells": int(s3.faces.shape[0]),
        f"{prefix}_captured_metric": round(
            float(s3.data_final_mesh["metric_per_iter"][-1]), 4),
        f"{prefix}_uniform_s": round(s3.data_final_mesh["t_uniform"], 3),
        f"{prefix}_adaptive_s": round(s3.data_final_mesh["t_adaptive"], 3),
        f"{prefix}_geometry_s": (
            round(s3.data_final_mesh["t_geometry"], 3)
            if s3.data_final_mesh["t_geometry"] else None),
        f"{prefix}_baseline_s": baseline_s,
        f"{prefix}_vs_baseline": round(baseline_s / totals[best], 2),
        f"{prefix}_n_iterations": int(s3.data_final_mesh["iterations"]),
        f"{prefix}_init_s": round(s3.data_final_mesh["t_init"], 3),
        f"{prefix}_renumber_s": round(
            s3.data_final_mesh["t_renumbering"], 3),
        f"{prefix}_checkpoint_s": round(
            s3.data_final_mesh["t_checkpoint"], 3),
    }
    out.update(throughput_metrics(f"{prefix}_", s3.data_final_mesh, {}))
    rep.emit(**out)


def emit_stl(rep: Report, stl_runs) -> None:
    totals = [r[2] for r in stl_runs]
    best = int(np.argmin(totals))
    s3_stl, n_tri, t_stl = stl_runs[best]
    out = {
        **_runs_dict("stl", totals),
        "stl_refine_s": round(t_stl, 3),
        "stl_n_triangles": int(n_tri),
        "stl_n_cells": int(s3_stl.faces.shape[0]),
        "stl_uniform_s": round(s3_stl.data_final_mesh["t_uniform"], 3),
        "stl_adaptive_s": round(s3_stl.data_final_mesh["t_adaptive"], 3),
        "stl_geometry_s": (round(s3_stl.data_final_mesh["t_geometry"], 3)
                           if s3_stl.data_final_mesh["t_geometry"] else None),
        # full ledger like c3d: refine == init + uniform + adaptive +
        # geometry + renumber + finalize + checkpoint (to within noise)
        "stl_init_s": round(s3_stl.data_final_mesh["t_init"], 3),
        "stl_knn_build_s": round(s3_stl.data_final_mesh["t_knn_build"], 3),
        "stl_renumber_s": round(s3_stl.data_final_mesh["t_renumbering"], 3),
        "stl_finalize_s": round(s3_stl.data_final_mesh["t_finalize"], 3),
        "stl_checkpoint_s": round(s3_stl.data_final_mesh["t_checkpoint"], 3),
    }
    out.update(throughput_metrics("stl_", s3_stl.data_final_mesh, {}))
    rep.emit(**out)


def repeat_budget_ok(rep: Report, last_run_s: float) -> bool:
    """Is there budget for another run of a workload that just took
    ``last_run_s``?  Repeat runs are warm, so the last run's wall (plus
    margin) is a good upper bound."""
    return rep.remaining() > 1.3 * last_run_s + 10.0


def main():
    budget_s = float(os.environ.get("S3_BENCH_BUDGET_S", "480"))
    rep = Report(budget_s)
    rep.emit()  # bootstrap line: parseable before ANY tunnel-touching work

    t_probe = probe_backend(timeout_s=max(30.0, min(240.0,
                                                    rep.remaining() - 60.0)))
    if t_probe < 0:
        rep.emit(value=-1.0, vs_baseline=0.0,
                 error=("accelerator backend failed to initialize (TPU "
                        "tunnel down) — no measurement taken"))
        return
    rep.emit(t_probe_s=round(t_probe, 3))

    from sparsespatialsampling_tpu import ExportData, write_svd_s_cube_to_file

    # The tunnel's channel init can wedge a PROCESS indefinitely while a
    # fresh process connects fine (observed: one process stuck >45 min as
    # new ones came up in minutes).  If the warmup readback exceeds the
    # deadline and budget remains, re-exec once or twice with the budget
    # reduced by the wall already spent — the stuck thread dies with the
    # exec, and a wedged-for-everyone tunnel just re-stalls until the
    # watchdog force-emits as before.
    import sys
    warmup_done = threading.Event()
    warmup_out = {}

    def _warm():
        warmup_out["t"] = warmup_tunnel()
        warmup_done.set()

    threading.Thread(target=_warm, daemon=True).start()
    reexec = int(os.environ.get("S3_BENCH_REEXEC", "0"))
    if (not warmup_done.wait(
            timeout=min(150.0, max(60.0, rep.remaining() - 180.0)))
            and reexec < 2 and rep.remaining() > 150.0):
        rep.emit(warmup_stalled_reexec=reexec + 1)
        os.environ["S3_BENCH_REEXEC"] = str(reexec + 1)
        os.environ["S3_BENCH_BUDGET_S"] = str(max(60.0, rep.remaining()))
        rep.cancel()
        sys.stdout.flush()
        os.execv(sys.executable, [sys.executable] + sys.argv)
    warmup_done.wait()  # wedged beyond re-exec budget: block; watchdog rules
    rep.emit(t_warmup_s=round(warmup_out["t"], 3), warmup_reexecs=reexec)
    xy, metric, poly = synthetic_oat15()
    tmp = tempfile.mkdtemp()

    # -- workload 1: OAT15 2D (headline, directly comparable to 26.93 s) --
    # The full pipeline runs twice (run1 pays program loads; steady state
    # is 2-20x faster), emitting after EVERY run so a stall between runs
    # cannot lose the measurement.
    n_snap = 50
    phases = np.linspace(0, 2 * np.pi, n_snap, endpoint=False)
    snaps = (metric[:, None]
             * (1 + 0.2 * np.sin(phases)[None, :])).astype(np.float32)
    times = [f"{t:.4f}" for t in np.arange(n_snap) * 5e-4]

    def run_oat_pipeline():
        s3, t_init, t_refine = run_refine_oat(xy, metric, poly, tmp, "bench")
        t1 = time.perf_counter()
        exp = ExportData(s3, write_times=times)
        exp.export(xy, snaps[:, None, :], "Ma", n_snapshots_total=n_snap)
        t_interp = time.perf_counter() - t1
        t2 = time.perf_counter()
        write_svd_s_cube_to_file("Ma", tmp, "bench", new_file=False, rank=20,
                                 n_modes=5)
        t_svd = time.perf_counter() - t2
        from sparsespatialsampling_tpu.utils import last_svd_timings
        return (s3, exp, t_init, t_refine, t_interp, t_svd,
                dict(last_svd_timings))

    oat_runs = [run_oat_pipeline()]
    emit_oat(rep, oat_runs)
    oat_wall = sum(oat_runs[0][3:6])
    while len(oat_runs) < 2 or (min(sum(r[3:6]) for r in oat_runs) > 6.0
                                and len(oat_runs) < 3):
        # second run always (warm steady state); third only as
        # degraded-tunnel insurance (warm runs land at ~1.5-3 s; if both
        # attempts miss that envelope by ~2x the wire is sick, not the
        # kernels — one more attempt often lands in a healthier phase)
        if not repeat_budget_ok(rep, oat_wall):
            rep.emit(oat_repeat_skipped="budget")
            break
        oat_runs.append(run_oat_pipeline())
        oat_wall = sum(oat_runs[-1][3:6])
        emit_oat(rep, oat_runs)
    rep.done("oat15_2d")

    # -- workload 2: cylinder3D north-star (warm device) ------------------
    if rep.remaining() > 60.0:
        runs = [run_cylinder3d(tmp)]
        emit_c3d(rep, runs)
        c3d_wall = runs[0][1] + runs[0][2] + runs[0][3]
        while len(runs) < 2 or (min(r[1] + r[2] + r[3] for r in runs) > 15.0
                                and len(runs) < 3):
            if not repeat_budget_ok(rep, c3d_wall):
                rep.emit(c3d_repeat_skipped="budget")
                break
            runs.append(run_cylinder3d(tmp))
            c3d_wall = runs[-1][1] + runs[-1][2] + runs[-1][3]
            emit_c3d(rep, runs)
        rep.done("cylinder3d")
    else:
        rep.emit(c3d_skipped="budget")

    # -- workload 3: cylinder2D metric-target (tutorial-1 config) ---------
    if rep.remaining() > 45.0:
        c2d_runs = [run_cylinder2d_metric(tmp)]
        emit_c2d(rep, c2d_runs, "c2d", C2D_BASELINE_S)
        while len(c2d_runs) < 2 or (min(r[1] for r in c2d_runs) > 8.0
                                    and len(c2d_runs) < 3):
            if not repeat_budget_ok(rep, c2d_runs[-1][1]):
                rep.emit(c2d_repeat_skipped="budget")
                break
            c2d_runs.append(run_cylinder2d_metric(tmp))
            emit_c2d(rep, c2d_runs, "c2d", C2D_BASELINE_S)
        rep.done("cylinder2d_metric")
    else:
        rep.emit(c2d_skipped="budget")

    # -- workload 4: STL obstacle at the reference's 5e4-triangle scale ---
    if rep.remaining() > 60.0:
        stl_runs = [run_stl(tmp)]
        emit_stl(rep, stl_runs)
        while len(stl_runs) < 2 or (min(r[2] for r in stl_runs) > 12.0
                                    and len(stl_runs) < 3):
            if not repeat_budget_ok(rep, stl_runs[-1][2]):
                rep.emit(stl_repeat_skipped="budget")
                break
            stl_runs.append(run_stl(tmp))
            emit_stl(rep, stl_runs)
        rep.done("stl")
    else:
        rep.emit(stl_skipped="budget")

    # -- workload 5: cylinder2D max_delta_level (tutorial-3 config) -------
    if rep.remaining() > 45.0:
        mdl_runs = [run_cylinder2d_metric(tmp, max_delta_level=True)]
        emit_c2d(rep, mdl_runs, "mdl", MDL_BASELINE_S)
        while len(mdl_runs) < 2 or (min(r[1] for r in mdl_runs) > 8.0
                                    and len(mdl_runs) < 3):
            if not repeat_budget_ok(rep, mdl_runs[-1][1]):
                rep.emit(mdl_repeat_skipped="budget")
                break
            mdl_runs.append(run_cylinder2d_metric(tmp, max_delta_level=True))
            emit_c2d(rep, mdl_runs, "mdl", MDL_BASELINE_S)
        rep.done("cylinder2d_max_delta_level")
    else:
        rep.emit(mdl_skipped="budget")

    # -- workload 6: at-scale 2M-point cloud ------------------------------
    # the regime where the reference OOMs; cells/s + the retry ledger keep
    # at-scale health driver-visible (round 4's regression was invisible)
    if rep.remaining() > 75.0:
        large_runs = [run_large(tmp)]
        emit_large(rep, large_runs)
        while len(large_runs) < 2 and min(r[1] for r in large_runs) > 14.0:
            # the cold first run is dominated by per-process program loads
            # (~45 s of dispatch at 2M shapes); a warm repeat measures
            # ~0.4x of it, so the generic 1.3x repeat margin would skip
            # the one run that shows steady-state at-scale throughput
            if rep.remaining() < 0.5 * large_runs[-1][1] + 15.0:
                rep.emit(large_repeat_skipped="budget")
                break
            large_runs.append(run_large(tmp))
            emit_large(rep, large_runs)
        rep.done("large_2m")
    else:
        rep.emit(large_skipped="budget")

    # -- workload 7: gather roofline --------------------------------------
    # normalizes each workload's epoch gather GB/s against what random
    # ~10 KB-row gathers can actually achieve on this chip
    if rep.remaining() > 30.0:
        peak = gather_roofline()
        out = {"gather_peak_gbps": round(peak, 2)}
        for prefix in ("", "c3d_", "c2d_", "stl_", "mdl_", "large_"):
            g = rep.data.get(f"{prefix}epoch_gather_gbps")
            if g is not None and peak > 0:
                out[f"{prefix}epoch_gather_pct_of_peak"] = round(
                    100.0 * g / peak, 1)
        rep.emit(**out)
        rep.done("gather_roofline")
    else:
        rep.emit(roofline_skipped="budget")


if __name__ == "__main__":
    main()
    # exit WITHOUT running interpreter/plugin teardown: the axon plugin's
    # atexit path aborts the process (observed "FATAL: exception not
    # rethrown" → rc 134) after perfectly successful runs, which would
    # hand the driver a failure rc with a complete result on stdout.  All
    # evidence is already flushed (Report.emit flushes every line).
    os._exit(0)

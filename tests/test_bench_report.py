"""The benchmark's evidence protocol (bench.Report) — round 3 lost its
entire perf record to a single killed process, so the streaming/budget
machinery is itself under test.

Run from the repo root (bench.py lives there; conftest puts jax on CPU,
and these tests never touch a backend)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _sandbox_sidecar(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "SIDECAR", str(tmp_path / "partial.json"))


@pytest.fixture
def make_report():
    """Reports whose watchdogs are DISARMED at teardown — a leaked live
    watchdog os._exit(0)s the pytest process up to budget_s later,
    silently truncating the suite with rc 0 (observed)."""
    reports = []

    def make(budget_s):
        rep = bench.Report(budget_s)
        reports.append(rep)
        return rep

    yield make
    for rep in reports:
        rep.cancel()


def test_emit_lines_are_cumulative_and_parseable(capsys, make_report):
    rep = make_report(60.0)
    rep.emit()
    rep.emit(t_probe_s=1.0)
    rep.emit(value=2.5, vs_baseline=10.0)
    rep.done("w1")
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    parsed = [json.loads(ln) for ln in lines]          # every line parses
    # each emit prints the full cumulative record followed by a compact
    # summary — the LAST stdout line must be the compact one (the driver's
    # bounded tail parses the last complete line)
    full, compact = parsed[-2], parsed[-1]
    assert full["value"] == 2.5 and full["t_probe_s"] == 1.0
    assert full["workloads_done"] == ["w1"]
    assert compact["value"] == 2.5 and compact["vs_baseline"] == 10.0
    assert compact["workloads_done"] == ["w1"]
    assert set(compact) <= set(full)
    # cumulative: later full lines carry every earlier key
    assert set(parsed[0]) <= set(full)
    # sidecar mirrors the full cumulative record
    side = json.loads(open(bench.SIDECAR).read())
    assert side == full


def test_compact_line_stays_short_under_huge_records(capsys, make_report):
    """Round 4's failure mode: the cumulative line grew past the driver's
    ~2,000-char tail capture, so no complete JSON line was in the tail.
    The compact summary must stay well under that bound no matter how many
    diagnostic keys the full record accumulates."""
    rep = make_report(60.0)
    junk = {f"diag_key_{i}_t_readback_s": round(i * 0.01, 3)
            for i in range(400)}
    rep.emit(value=1.25, vs_baseline=21.5,
             oat_run1_s=9.1, oat_run2_s=1.2, c3d_value_s=2.6,
             c2d_value_s=0.64, stl_refine_s=1.4, mdl_value_s=0.57,
             large_value_s=11.0, large_cells_per_s=25_000.0,
             gather_peak_gbps=62.8, **junk)
    rep.done("all")
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    last = lines[-1]
    assert len(last) < 1500, f"compact line too long: {len(last)}"
    compact = json.loads(last)
    assert compact["value"] == 1.25
    assert compact["oat_run2_s"] == 1.2
    assert compact["large_cells_per_s"] == 25_000.0
    assert "diag_key_0_t_readback_s" not in compact
    # the full record (second to last) still carries everything
    full = json.loads(lines[-2])
    assert full["diag_key_399_t_readback_s"] == 3.99


def test_budget_accounting(make_report):
    rep = make_report(1000.0)
    assert 0 <= rep.elapsed() < 5
    assert rep.remaining() > 990
    assert bench.repeat_budget_ok(rep, last_run_s=10.0)
    assert not bench.repeat_budget_ok(rep, last_run_s=10000.0)


def test_watchdog_force_emits_and_exits_zero():
    """A stalled workload must not zero the evidence: the watchdog emits
    the cumulative line and exits 0 when the budget expires (os._exit —
    fires even mid-stall), so run it in a subprocess."""
    code = (
        "import sys, time; sys.path.insert(0, %r)\n"
        "import bench\n"
        "bench.SIDECAR = %r\n"
        "rep = bench.Report(budget_s=1.0)\n"
        "rep.emit(value=7.0)\n"
        "time.sleep(30)   # 'stalled workload'\n"
    ) % (REPO, os.devnull)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=20)
    assert r.returncode == 0
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    last = json.loads(lines[-1])
    assert last["budget_exhausted"] is True
    assert last["value"] == 7.0

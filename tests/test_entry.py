"""Regression tests for the driver entry module.

Round-1 failure mode: the driver imports ``__graft_entry__`` under the
real-TPU plugin and calls ``dryrun_multichip(8)`` directly — the function
must self-force a virtual CPU mesh instead of relying on the caller's
environment (VERDICT round 1, item 1).
"""
import os
import subprocess
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as entry_mod  # noqa: E402


class TestEntry:
    def test_entry_compiles_and_runs(self):
        fn, args = entry_mod.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (1024,)
        import numpy as np
        assert np.isfinite(np.asarray(out)).all()

    def test_dryrun_multichip_inline(self):
        """Under the test env (8 virtual CPU devices) the dry run executes
        in-process."""
        assert entry_mod._cpu_mesh_ready(8)
        entry_mod.dryrun_multichip(8)

    def test_dryrun_multichip_self_forces_subprocess(self, monkeypatch):
        """When the hosting process cannot provide the mesh (the driver's
        situation), the dry run must still pass via its own subprocess."""
        monkeypatch.setattr(entry_mod, "_cpu_mesh_ready", lambda n: False)
        entry_mod.dryrun_multichip(4)

    def test_dryrun_subprocess_failure_raises(self, monkeypatch):
        monkeypatch.setattr(entry_mod, "_cpu_mesh_ready", lambda n: False)
        monkeypatch.setattr(
            entry_mod.subprocess, "run",
            lambda *a, **kw: subprocess.CompletedProcess(a, 1, "", "boom"))
        with pytest.raises(RuntimeError, match="boom"):
            entry_mod.dryrun_multichip(8)

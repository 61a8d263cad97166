"""Multi-host (two-process) distributed smoke test — SURVEY.md 2.6's
backend row past the docstring: jax.distributed.initialize over loopback,
one global mesh spanning both processes, collectives verified against the
host-side result. Wraps tools/multihost_smoke.py."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_mesh():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py")],
        capture_output=True,
        text=True,
        timeout=900,
        env=dict(os.environ, PPST_MULTIHOST_PORT="13013"),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MULTIHOST OK" in r.stdout


@pytest.mark.slow
def test_two_process_train_step():
    """The REAL train steps across a two-process mesh match the
    single-process run (VERDICT r2 ask #7)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_train_smoke.py")],
        capture_output=True,
        text=True,
        timeout=2400,
        env=dict(os.environ, PPST_MULTIHOST_PORT="13027"),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MULTIHOST-TRAIN OK" in r.stdout

"""Multi-process jax.distributed bring-up (VERDICT r1 item 8).

Opt-in (spawns subprocesses, ~1 min): run with PNP_TPU_MULTIPROC=1.
The smoke itself asserts trajectory parity vs a single process; see
tools/multiproc_smoke.py.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("PNP_TPU_MULTIPROC") != "1",
    reason="opt-in: set PNP_TPU_MULTIPROC=1 (spawns 2 extra processes)")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_pipeline():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiproc_smoke.py")],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": ""})
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "MULTIPROC-OK" in out.stdout

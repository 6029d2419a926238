"""Multi-process jax.distributed bring-up (VERDICT r1 item 8, r2 item 6).

In the DEFAULT suite since r3 (the opt-in gate let ``DistContext``'s
multi-process safety rot silently): spawns 2 worker processes that
initialize ``jax.distributed`` against a localhost coordinator and run a
distributed production step; trajectory parity vs a single process is
asserted inside the smoke (tools/multiproc_smoke.py). Auto-skips only
when the coordinator port cannot be bound (sandboxed/loopback-less
environments) or PNP_TPU_MULTIPROC=0 explicitly opts out.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("PNP_TPU_MULTIPROC") == "0",
    reason="explicitly disabled via PNP_TPU_MULTIPROC=0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError as e:
            pytest.skip(f"cannot bind a localhost port: {e}")
        return s.getsockname()[1]


def test_two_process_pipeline():
    port = _free_port()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiproc_smoke.py"),
         "--port", str(port)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": ""})
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "MULTIPROC-OK" in out.stdout

"""Test harness: run on CPU with 8 virtual devices (multi-chip substitute).

The container pre-imports jax and registers the TPU backend via a
sitecustomize hook, so plain env vars are too late; jax.config.update
still works because backends initialize lazily. This is the TPU-native
analogue of "mpirun without a cluster" (SURVEY.md section 4e).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices share the host's (2) cores: a large shard's
    # compute between collectives can exceed the 40 s default rendezvous
    # termination timeout under load, which CHECK-fails the process
    # (observed at 46,653 nodes, tools/dryrun_large_l2.log r5)
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REFERENCE = pathlib.Path("/root/reference")


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the CPU backend; got " + str(jax.devices()))


@pytest.fixture(scope="session")
def ref_test_dir():
    if not REFERENCE.exists():
        pytest.skip("reference tree not mounted")
    return REFERENCE / "test"

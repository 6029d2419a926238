"""Test harness: run on CPU with 8 virtual devices (multi-chip substitute).

Must set env before the first jax import anywhere in the test process —
this is the TPU-native analogue of "mpirun without a cluster".
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def ref_test_dir():
    if not REFERENCE.exists():
        pytest.skip("reference tree not mounted")
    return REFERENCE / "test"

"""Test harness: run on CPU with 8 virtual devices (multi-chip substitute).

The container pre-imports jax and registers the TPU backend via a
sitecustomize hook, so plain env vars are too late; jax.config.update
still works because backends initialize lazily. This is the TPU-native
analogue of "mpirun without a cluster" (SURVEY.md section 4e).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
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

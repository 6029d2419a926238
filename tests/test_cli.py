"""CLI launcher smoke tests (run.py / pnp_tpu.cli)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=240):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the sitecustomize pre-imports jax before env is read; go through a
    # wrapper that forces the platform like conftest does
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "from pnp_tpu.cli import main; sys.exit(main(%r))" % (REPO, args))
    return subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_pb_workload(ref_test_dir):
    r = run_cli(["-w", "pb",
                 str(ref_test_dir / "one_wall_dh/one_wall.cfg")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PB Newton" in r.stdout


def test_stationary_diffusion_with_output(ref_test_dir, tmp_path):
    out = str(tmp_path / "o")
    r = run_cli(["-w", "stationary_diffusion", "-o", out,
                 str(ref_test_dir / "one_wall_dh/one_wall.cfg")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "solution.dat.dat"))
    assert os.path.exists(os.path.join(out, "yeah.vtu"))


def test_production_driver_steps(ref_test_dir, tmp_path):
    r = run_cli(["--steps", "2", "-o", str(tmp_path / "run"),
                 str(ref_test_dir / "one_wall_dh/one_wall.cfg")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "assembled-solved DOFs/s" in r.stdout
    assert os.path.exists(str(tmp_path / "run" / "current.dat"))


def test_solver_and_degree_flags(ref_test_dir):
    r = run_cli(["-w", "pb", "-s", "CG_Jacobi", "-p", "2",
                 str(ref_test_dir / "one_wall_dh/one_wall.cfg")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "P2" in r.stdout


def test_distributed_driver_via_n_flag(ref_test_dir, tmp_path):
    """-n > 1 routes to the v2 owner-partitioned production driver."""
    env_extra = "--xla_force_host_platform_device_count=2"
    import os as _os
    code_env = dict(_os.environ)
    code_env["JAX_PLATFORMS"] = "cpu"
    code_env["XLA_FLAGS"] = (code_env.get("XLA_FLAGS", "")
                             + " " + env_extra)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "from pnp_tpu.cli import main; sys.exit(main(%r))"
        % (REPO, ["-n", "2", "--steps", "2", "-o", str(tmp_path / "d"),
                  str(ref_test_dir / "one_wall_dh/one_wall.cfg")]))
    r = subprocess.run([sys.executable, "-c", code], env=code_env,
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "steps on 2 devices" in r.stdout
    assert os.path.exists(str(tmp_path / "d" / "current.dat"))

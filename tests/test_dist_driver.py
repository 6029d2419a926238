"""Distributed production DRIVER (phase D) — output, checkpoint, parity.

VERDICT r1 item 2: the owner-partitioned pipeline must be a full
production driver, not a step engine: time loop + ion flux + writers +
checkpoint/resume, with current.dat identical across device counts
(reference phase D, src/instationary_pnp_from_pb_md.hh:421-456).
"""

import os

import jax
import numpy as np
import pytest

from pnp_tpu.config import read_config
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio import read_gmsh
from pnp_tpu.parallel.sharding import make_device_mesh
from pnp_tpu.workloads.distributed_pnp import run_distributed_pnp_from_pb
from pnp_tpu.workloads.instationary_pnp_from_pb import (
    run_instationary_pnp_from_pb)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")

ONE_WALL = "/root/reference/test/one_wall_dh/one_wall.cfg"
N_STEPS = 4


@pytest.fixture(scope="module")
def problem():
    cfg = read_config(ONE_WALL)
    cfg.verbosity = 0
    cfg.outputFreq = 2
    mesh = read_gmsh(cfg.meshfile)
    return cfg, FunctionSpace(mesh, 1)


@pytest.fixture(scope="module")
def run8(problem, tmp_path_factory):
    cfg, space = problem
    out = tmp_path_factory.mktemp("dist8")
    res = run_distributed_pnp_from_pb(
        cfg, space, make_device_mesh(8), n_steps=N_STEPS,
        output_dir=str(out),
        checkpoint_path=str(out / "ck.npz"), checkpoint_freq=3)
    return res, out


@needs_8
def test_driver_outputs_written(run8):
    res, out = run8
    assert res.steps == N_STEPS
    assert len(res.current_history) == 2          # outputFreq=2 over 4 steps
    names = sorted(os.listdir(out))
    for expected in ("current.dat", "phi.dat", "phi001.dat", "phi002.dat",
                     "data001.vtu", "data002.vtu", "ck.npz"):
        assert expected in names, (expected, names)


@needs_8
def test_current_dat_identical_across_device_counts(problem, run8,
                                                    tmp_path):
    """The gathered-to-host output path makes current.dat a function of the
    trajectory only; 2- and 8-device runs agree to solver tolerance."""
    cfg, space = problem
    _, out8 = run8
    res2 = run_distributed_pnp_from_pb(
        cfg, space, make_device_mesh(2), n_steps=N_STEPS,
        output_dir=str(tmp_path))
    c8 = np.loadtxt(out8 / "current.dat")
    c2 = np.loadtxt(tmp_path / "current.dat")
    np.testing.assert_allclose(c2, c8, rtol=0, atol=1e-8)


@needs_8
def test_driver_matches_single_chip_trajectory(problem, run8):
    """Same phases, same tolerances -> the distributed driver reproduces
    the single-chip driver's fields and ion-flux history far below the
    1e-5 stage tolerance on this problem."""
    cfg, space = problem
    res_d, _ = run8
    res_s = run_instationary_pnp_from_pb(cfg, space, n_steps=N_STEPS)
    np.testing.assert_allclose(res_d.phi, np.asarray(res_s.phi), atol=1e-8)
    np.testing.assert_allclose(res_d.cp, np.asarray(res_s.cp), atol=1e-8)
    np.testing.assert_allclose(res_d.cm, np.asarray(res_s.cm), atol=1e-8)
    assert len(res_d.current_history) == len(res_s.current_history)
    for (td, ipd, imd), (ts, ips, ims) in zip(res_d.current_history,
                                              res_s.current_history):
        assert td == pytest.approx(ts)
        np.testing.assert_allclose(ipd, ips, atol=1e-8)
        np.testing.assert_allclose(imd, ims, atol=1e-8)


@needs_8
def test_checkpoint_resume_across_device_counts(problem, run8, tmp_path):
    """A checkpoint written under 8 devices resumes under 4 (global
    format; partitioning is derived state) and lands on the full-run
    state."""
    cfg, space = problem
    res_full, out8 = run8
    res_resumed = run_distributed_pnp_from_pb(
        cfg, space, make_device_mesh(4), n_steps=N_STEPS,
        checkpoint_path=str(out8 / "ck.npz"), resume=True)
    # resume starts at step 3 of 4; the remaining trajectory must agree
    np.testing.assert_allclose(res_resumed.phi, res_full.phi, atol=1e-8)
    np.testing.assert_allclose(res_resumed.cp, res_full.cp, atol=1e-8)
    np.testing.assert_allclose(res_resumed.cm, res_full.cm, atol=1e-8)


@needs_8
def test_pore_distributed_matches_single_chip(ref_test_dir, tmp_path):
    """PRODUCTION-SHAPE parity (VERDICT r2 item 4): 3 steps of the
    3,048-node pore transient on 8 devices vs the single-chip dense path,
    fields AND current.dat. Halo widths, Schwarz blocks, and owner
    partitioning are exercised at the shape the engine ships with, not
    only on the 46-dof one_wall toy. Both runs presolve the potential
    (tamed transient) and share the PB bootstrap so the comparison
    isolates phase C/D; tolerance is the documented stage-solve slack
    budget (1e-5 stage solves leave ~1e-4 relative slack over 3 steps,
    CLAUDE.md / test_driver_large_mesh_path_matches_dense)."""
    from pnp_tpu.workloads.pb import solve_pb

    cfg = read_config(str(ref_test_dir / "pore_pnp/pore.cfg"))
    cfg.verbosity = 0
    cfg.outputFreq = 1
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    pb = np.asarray(solve_pb(cfg, space).u)
    out_d = tmp_path / "dist"
    res_d = run_distributed_pnp_from_pb(
        cfg, space, make_device_mesh(8), n_steps=3, pb_field=pb,
        presolve_potential=True, output_dir=str(out_d))
    res_s = run_instationary_pnp_from_pb(
        cfg, space, n_steps=3, presolve_potential=True,
        output_dir=str(tmp_path / "single"))
    for name, a, b in (("phi", res_s.phi, res_d.phi),
                       ("cp", res_s.cp, res_d.cp),
                       ("cm", res_s.cm, res_d.cm)):
        a = np.asarray(a)
        assert np.isfinite(b).all(), name
        scale = float(np.max(np.abs(a))) + 1.0
        assert float(np.max(np.abs(a - b))) / scale < 2e-4, name
    c_d = np.loadtxt(out_d / "current.dat")
    c_s = np.loadtxt(tmp_path / "single" / "current.dat")
    assert c_d.shape == c_s.shape
    scale = np.max(np.abs(c_s)) + 1.0
    np.testing.assert_allclose(c_d, c_s, rtol=0, atol=2e-4 * scale)


@needs_8
def test_p2_distributed_matches_single_chip(ref_test_dir):
    """P2 THROUGH THE DISTRIBUTED CONTEXT (VERDICT r2 item 8): edge DOFs
    partitioned over 4 devices — ownership/halo of non-vertex DOFs is
    exactly the hard part SURVEY §7 called out. Trajectory must match the
    single-chip P2 run to solver tolerance."""
    cfg = read_config(ONE_WALL)
    cfg.verbosity = 0
    space = FunctionSpace(read_gmsh(cfg.meshfile), 2)
    res_d = run_distributed_pnp_from_pb(cfg, space, make_device_mesh(4),
                                        n_steps=2)
    res_s = run_instationary_pnp_from_pb(cfg, space, n_steps=2)
    np.testing.assert_allclose(res_d.phi, np.asarray(res_s.phi), atol=1e-8)
    np.testing.assert_allclose(res_d.cp, np.asarray(res_s.cp), atol=1e-8)
    np.testing.assert_allclose(res_d.cm, np.asarray(res_s.cm), atol=1e-8)


@needs_8
def test_schwarz_factor_reuse_matches(problem, run8):
    """ras_refresh_every amortizes the distributed Schwarz block-LU; the
    stale factor only raises Krylov counts, so the trajectory matches the
    fresh-factor run far below stage tolerance on this problem."""
    cfg, space = problem
    res_f, _ = run8
    res_r = run_distributed_pnp_from_pb(
        cfg, space, make_device_mesh(8), n_steps=N_STEPS,
        ras_refresh_every=4)
    np.testing.assert_allclose(res_r.phi, res_f.phi, atol=1e-7)
    np.testing.assert_allclose(res_r.cp, res_f.cp, atol=1e-7)
    np.testing.assert_allclose(res_r.cm, res_f.cm, atol=1e-7)

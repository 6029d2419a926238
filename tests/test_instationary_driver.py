"""End-to-end tests of the production instationary PNP-from-PB driver.

Physics check: the PB-bootstrapped initial state (phi = phi_PB,
c+- = c0 exp(-+ phi_PB)) is the continuous steady state of the
drift-diffusion + Poisson system with matching BCs, so a short run must
stay near it (up to the quadrature/discretization mismatch between the PB
and species operators). Also exercises writers, current.dat, checkpointing.
"""

import os

import numpy as np
import pytest

from pnp_tpu.config import read_config
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio import read_gmsh
from pnp_tpu.workloads.instationary_pnp_from_pb import run_instationary_pnp_from_pb


@pytest.fixture(scope="module")
def one_wall(ref_test_dir):
    sys = read_config(str(ref_test_dir / "one_wall_dh/one_wall.cfg"))
    mesh = read_gmsh(sys.meshfile)
    return sys, FunctionSpace(mesh, 1)


def test_near_equilibrium_short_run(one_wall):
    sys, space = one_wall
    res = run_instationary_pnp_from_pb(sys, space, n_steps=5)
    phi, cp, cm = map(np.asarray, (res.phi, res.cp, res.cm))
    assert np.isfinite(phi).all() and np.isfinite(cp).all() and np.isfinite(cm).all()
    # stays near the Gibbs equilibrium bootstrap
    cp0 = sys.c0 * np.exp(-phi)
    cm0 = sys.c0 * np.exp(+phi)
    assert np.linalg.norm(cp - cp0) / np.linalg.norm(cp0) < 0.05
    assert np.linalg.norm(cm - cm0) / np.linalg.norm(cm0) < 0.05
    # concentrations stay positive at equilibrium-ish state
    assert cp.min() > 0 and cm.min() > 0
    # flux history recorded every outputFreq (=1) steps
    assert len(res.current_history) == 5
    t, ip, im = res.current_history[-1]
    assert ip.shape == (sys.n_surfaces,) and np.isfinite(ip).all()


def test_longer_run_stays_stationary(one_wall):
    """50 steps at tau=0.1: the state must converge, not drift or blow up."""
    sys, space = one_wall
    r1 = run_instationary_pnp_from_pb(sys, space, n_steps=25)
    r2 = run_instationary_pnp_from_pb(sys, space, n_steps=50)
    d = np.linalg.norm(np.asarray(r1.cp) - np.asarray(r2.cp))
    assert d / np.linalg.norm(np.asarray(r2.cp)) < 1e-2
    # the final solve keeps phi consistent with PB-scale values
    assert np.abs(np.asarray(r2.phi)).max() < 1.0


def test_outputs_and_checkpoint(tmp_path, one_wall):
    sys, space = one_wall
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck.npz")
    res = run_instationary_pnp_from_pb(
        sys, space, n_steps=4, output_dir=out,
        checkpoint_path=ck, checkpoint_freq=2)
    assert os.path.exists(os.path.join(out, "current.dat"))
    assert os.path.exists(os.path.join(out, "phi001.dat"))
    assert os.path.exists(os.path.join(out, "data001.vtu"))
    assert os.path.exists(ck)
    # .dat layout: x y \t value \t gx gy
    line = open(os.path.join(out, "phi001.dat")).readline().split()
    assert len(line) == 5
    # resume from checkpoint reproduces the straight-through run
    res2 = run_instationary_pnp_from_pb(
        sys, space, n_steps=4, checkpoint_path=ck, resume=True)
    np.testing.assert_allclose(np.asarray(res2.phi), np.asarray(res.phi),
                               rtol=1e-10, atol=1e-12)


def test_current_dat_row_layout(tmp_path, one_wall):
    sys, space = one_wall
    out = str(tmp_path / "o2")
    run_instationary_pnp_from_pb(sys, space, n_steps=2, output_dir=out)
    rows = open(os.path.join(out, "current.dat")).read().strip().split("\n")
    assert len(rows) == 2
    cols = rows[0].split()
    assert len(cols) == 1 + 2 * sys.n_surfaces  # time + (ip, im) per surface

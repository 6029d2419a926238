"""Monolithic PNP workloads: stationary Newton and explicit instationary.

Physics checks: with matching BCs the Gibbs state (phi_PB, c0 e^-+phi) is
(near-)stationary for the coupled system; the monolithic Newton solve from
the PB bootstrap must converge and stay consistent with the operator-split
production driver's steady state.
"""

import numpy as np
import pytest

from pnp_tpu.config import read_config
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio import read_gmsh
from pnp_tpu.workloads.stationary_pnp import run_stationary_pnp, split_fields
from pnp_tpu.workloads.instationary_pnp import run_instationary_pnp


@pytest.fixture(scope="module")
def one_wall(ref_test_dir):
    sys = read_config(str(ref_test_dir / "one_wall_dh/one_wall.cfg"))
    mesh = read_gmsh(sys.meshfile)
    return sys, FunctionSpace(mesh, 1)


def test_stationary_pnp_from_pb(one_wall):
    sys, space = one_wall
    res = run_stationary_pnp(sys, space, from_pb=True)
    assert res.converged
    phi, cp, cm = map(np.asarray, split_fields(space, res.u))
    assert np.isfinite(phi).all()
    assert cp.min() > 0 and cm.min() > 0
    # converged coupled state obeys the monolithic operator's OWN Gibbs
    # convention c+ = C e^{+phi}, c- = C e^{-phi} (see operators/pnp.py
    # CONVENTION NOTE: the reference monolithic weak form mirrors the
    # species labels of the operator-split production driver)
    assert np.linalg.norm(cp - sys.c0 * np.exp(+phi)) / np.linalg.norm(cp) < 0.05
    assert np.linalg.norm(cm - sys.c0 * np.exp(-phi)) / np.linalg.norm(cm) < 0.05
    # and near the PB potential itself
    from pnp_tpu.workloads.pb import solve_pb
    pb = np.asarray(solve_pb(sys, space).u)
    assert np.linalg.norm(phi - pb) / max(np.linalg.norm(pb), 1e-30) < 0.05


def test_stationary_pnp_cold_start(one_wall):
    """Newton from the no-PB initial state also converges to the same root."""
    sys, space = one_wall
    r1 = run_stationary_pnp(sys, space, from_pb=True)
    r2 = run_stationary_pnp(sys, space, from_pb=False)
    assert r2.converged
    d = np.linalg.norm(np.asarray(r1.u) - np.asarray(r2.u))
    # both converged to newtonReduction=1e-5: roots agree to ~that level
    assert d / np.linalg.norm(np.asarray(r1.u)) < 1e-3


def test_explicit_instationary_stable(one_wall):
    sys, space = one_wall
    res = run_instationary_pnp(sys, space, n_steps=20)
    for f in (res.phi, res.cp, res.cm):
        assert np.isfinite(np.asarray(f)).all()
    # CFL dt is small and positive
    assert 0 < res.dt <= sys.tau
    # equilibrium bootstrap stays near-stationary under explicit stepping
    cp = np.asarray(res.cp)
    assert cp.min() > 0
    phi = np.asarray(res.phi)
    assert np.abs(phi).max() < 1.0

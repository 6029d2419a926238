"""Time integration: heat-equation decay vs analytic, scheme orders.

Validates the PDELab tableau semantics (A/B/D stage equations) and the
LinearOneStepMethod stage solves: u_t - Laplace(u) = 0 on the unit square
with homogeneous Dirichlet BCs and u0 = sin(pi x) sin(pi y) decays as
exp(-2 pi^2 t) in the first mode.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.fem.geometry import build_volume_tables
from pnp_tpu.fem import assembly as FA
from pnp_tpu.meshio.structured import rect_mesh
from pnp_tpu.operators import volume as V
from pnp_tpu.solvers.linear_problem import make_krylov_solver
from pnp_tpu.timestepping import (
    implicit_euler, alexander2, one_step_theta, fractional_step_theta,
    LinearOneStepMethod)


def heat_setup(n=16, degree=1):
    mesh = rect_mesh(n, n, 1.0, 1.0)
    space = FunctionSpace(mesh, degree)
    vt = build_volume_tables(space, 2 * degree + 1)
    M_el = V.mass_jacobian_el(vt)
    K_el = V.laplace_jacobian_el(vt)
    # all boundary dofs constrained to 0
    free = np.ones(space.ndof, dtype=bool)
    free[np.unique(space.bedge_dofs)] = False
    free = jnp.asarray(free)
    x = space.dof_coords
    u0 = jnp.asarray(np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]))
    u0 = jnp.where(free, u0, 0.0)
    return space, vt, M_el, K_el, free, u0


def run_heat(tab, n_steps, T=0.02, n=16, degree=1):
    space, vt, M_el, K_el, free, u0 = heat_setup(n, degree)
    krylov = make_krylov_solver("CG_Jacobi", 10000)
    method = LinearOneStepMethod(
        tab, M_el, K_el, jnp.zeros(space.ndof), vt.dofmap, space.ndof,
        free, krylov, 1e-12, lambda t: jnp.zeros(space.ndof))
    dt = T / n_steps
    u, t = u0, 0.0
    for _ in range(n_steps):
        u, _ = method.apply(t, dt, u)
        t += dt
    return np.asarray(u), np.asarray(u0), T


_REF_CACHE = {}


def decay_error(tab, n_steps):
    """Temporal error vs a fine-dt reference on the SAME spatial mesh
    (isolates time-integration error from the h^2 spatial floor)."""
    if "ref" not in _REF_CACHE:
        _REF_CACHE["ref"] = run_heat(alexander2(), 256)[0]
    u, _, _ = run_heat(tab, n_steps)
    ref = _REF_CACHE["ref"]
    return np.linalg.norm(u - ref) / np.linalg.norm(ref)


@pytest.mark.parametrize("tab,order", [
    (implicit_euler(), 1),
    (one_step_theta(0.5), 2),
    (alexander2(), 2),
    (fractional_step_theta(), 2),
])
def test_scheme_order(tab, order):
    e1 = decay_error(tab, 4)
    e2 = decay_error(tab, 8)
    rate = e1 / max(e2, 1e-15)
    assert rate > 2 ** order * 0.6, (tab.name, e1, e2, rate)


def test_long_time_stability():
    """Stiffly accurate DIRK stays stable at large dt (A-stability)."""
    u, u0, _ = run_heat(alexander2(), n_steps=5, T=5.0)
    assert np.abs(u).max() < 1e-3  # fully decayed, no oscillation


def test_dirichlet_values_applied():
    """Nonzero boundary values at stage times reach the solution."""
    space, vt, M_el, K_el, free, u0 = heat_setup(8)
    krylov = make_krylov_solver("CG_Jacobi", 10000)
    g = jnp.where(free, 0.0, 1.0)
    method = LinearOneStepMethod(
        alexander2(), M_el, K_el, jnp.zeros(space.ndof), vt.dofmap,
        space.ndof, free, krylov, 1e-12, lambda t: g)
    u, _ = method.apply(0.0, 0.1, jnp.where(free, 0.0, 1.0))
    np.testing.assert_allclose(np.asarray(u)[~np.asarray(free)], 1.0)
    # interior warms toward the boundary value (consistent-mass FEM has no
    # discrete maximum principle, so allow the well-known mild overshoot)
    interior = np.asarray(u)[np.asarray(free)]
    assert interior.max() > 0.0 and interior.max() < 1.2
    # long-time limit is the constant boundary value
    for _ in range(100):
        u, _ = method.apply(0.0, 0.5, u)
    np.testing.assert_allclose(np.asarray(u), 1.0, atol=1e-6)

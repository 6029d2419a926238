"""Krylov solvers, preconditioners, Newton, AMG two-level scheme."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.fem.geometry import build_volume_tables
from pnp_tpu.fem import assembly as FA
from pnp_tpu.meshio.structured import rect_mesh
from pnp_tpu.operators import volume as V
from pnp_tpu.solvers.krylov import cg, bicgstab
from pnp_tpu.solvers.precond import (
    jacobi_precond, chebyshev_jacobi_precond, estimate_dinv_spectral_radius)
from pnp_tpu.solvers.amg import make_amg_context, two_level_precond


@pytest.fixture(scope="module")
def poisson_system():
    """Dirichlet Laplace system on a 24x24 unit square."""
    mesh = rect_mesh(24, 24, 1.0, 1.0)
    space = FunctionSpace(mesh, 1)
    vt = build_volume_tables(space, 2)
    A_el = V.laplace_jacobian_el(vt)
    free = np.ones(space.ndof, dtype=bool)
    free[np.unique(space.bedge_dofs)] = False
    free = jnp.asarray(free)
    op = FA.make_constrained_operator(A_el, vt.dofmap, space.ndof, free)
    diag = FA.constrained_diagonal(A_el, vt.dofmap, space.ndof, free)
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.standard_normal(space.ndof)) * free
    return space, vt, A_el, free, op, diag, b


def test_cg_solves(poisson_system):
    space, vt, A_el, free, op, diag, b = poisson_system
    res = cg(op, b, jnp.zeros_like(b), None, 1e-10, 2000)
    assert bool(res.converged)
    r = b - op(res.x)
    assert float(jnp.linalg.norm(r)) < 1e-9 * float(jnp.linalg.norm(b))


def test_bicgstab_solves(poisson_system):
    space, vt, A_el, free, op, diag, b = poisson_system
    res = bicgstab(op, b, jnp.zeros_like(b), None, 1e-10, 2000)
    assert bool(res.converged)
    x_cg = cg(op, b, jnp.zeros_like(b), None, 1e-12, 2000).x
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_cg),
                               rtol=1e-6, atol=1e-9)


def test_jacobi_and_chebyshev_accelerate(poisson_system):
    space, vt, A_el, free, op, diag, b = poisson_system
    it_plain = int(cg(op, b, jnp.zeros_like(b), None, 1e-8, 2000).iterations)
    it_jac = int(cg(op, b, jnp.zeros_like(b), jacobi_precond(diag),
                    1e-8, 2000).iterations)
    lam = estimate_dinv_spectral_radius(op, diag, b)
    M = chebyshev_jacobi_precond(op, diag, lam, degree=3)
    it_cheb = int(cg(op, b, jnp.zeros_like(b), M, 1e-8, 2000).iterations)
    assert it_cheb < it_plain
    assert it_cheb < it_jac  # polynomial precond beats plain Jacobi


def test_amg_two_level_accelerates(poisson_system):
    space, vt, A_el, free, op, diag, b = poisson_system
    it_jac = int(cg(op, b, jnp.zeros_like(b), jacobi_precond(diag),
                    1e-8, 2000).iterations)
    ctx = make_amg_context(vt.dofmap, space.ndof, free, target_coarse=64)
    M = two_level_precond(A_el, ctx, diag)
    res = cg(op, b, jnp.zeros_like(b), M, 1e-8, 2000)
    assert bool(res.converged)
    assert int(res.iterations) < it_jac * 0.7, (
        f"AMG {int(res.iterations)} vs Jacobi {it_jac}")
    r = b - op(res.x)
    assert float(jnp.linalg.norm(r)) < 1e-7 * float(jnp.linalg.norm(b))


def test_constrained_operator_identity_rows(poisson_system):
    space, vt, A_el, free, op, diag, b = poisson_system
    x = jnp.asarray(np.random.RandomState(1).standard_normal(space.ndof))
    y = op(x)
    np.testing.assert_allclose(np.asarray(y)[~np.asarray(free)],
                               np.asarray(x)[~np.asarray(free)])

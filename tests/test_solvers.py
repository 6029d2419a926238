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
    ctx = make_amg_context(vt.dofmap, space.ndof, free, target_coarse=64,
                           dof_coords=np.asarray(space.dof_coords))
    M = two_level_precond(A_el, ctx, diag)
    res = cg(op, b, jnp.zeros_like(b), M, 1e-8, 2000)
    assert bool(res.converged)
    assert int(res.iterations) < it_jac * 0.7, (
        f"AMG {int(res.iterations)} vs Jacobi {it_jac}")
    r = b - op(res.x)
    assert float(jnp.linalg.norm(r)) < 1e-7 * float(jnp.linalg.norm(b))


def test_amg_beats_chebyshev_at_scale():
    """VERDICT r1 item 7: on a mesh large enough that the coarse level
    matters, the geometry-aware two-level scheme must beat Chebyshev-
    Jacobi(3) on ITERATION count (the r1 flooded/modular coarse space
    degenerated to smoothed Jacobi and could not)."""
    mesh = rect_mesh(100, 100, 1.0, 1.0)
    space = FunctionSpace(mesh, 1)
    vt = build_volume_tables(space, 2)
    A_el = V.laplace_jacobian_el(vt)
    coords = np.asarray(space.dof_coords)
    free = jnp.asarray(~((coords[:, 0] < 1e-12) | (coords[:, 0] > 1 - 1e-12)))
    op = FA.make_constrained_operator(A_el, vt.dofmap, space.ndof, free)
    diag = FA.constrained_diagonal(A_el, vt.dofmap, space.ndof, free)
    b = jnp.where(free,
                  jnp.asarray(np.random.RandomState(0).standard_normal(
                      space.ndof)), 0.0)
    lam = estimate_dinv_spectral_radius(op, diag, b)
    M_cheb = chebyshev_jacobi_precond(op, diag, lam, degree=3)
    it_cheb = int(cg(op, b, jnp.zeros_like(b), M_cheb, 1e-8, 4000).iterations)
    ctx = make_amg_context(vt.dofmap, space.ndof, free, target_coarse=256,
                           dof_coords=coords)
    res = cg(op, b, jnp.zeros_like(b), two_level_precond(A_el, ctx, diag),
             1e-8, 4000)
    assert bool(res.converged)
    assert int(res.iterations) < it_cheb, (
        f"two-level {int(res.iterations)} vs Chebyshev {it_cheb}")
    r = b - op(res.x)
    assert float(jnp.linalg.norm(r)) < 1e-7 * float(jnp.linalg.norm(b))


def test_amg_batched_systems_match_flat():
    """two_level_precond on a (2, ...) stacked system equals per-system
    applications (the species stage path uses the batched form)."""
    mesh = rect_mesh(16, 16, 1.0, 1.0)
    space = FunctionSpace(mesh, 1)
    vt = build_volume_tables(space, 2)
    A_el = V.laplace_jacobian_el(vt)
    coords = np.asarray(space.dof_coords)
    free = np.ones(space.ndof, dtype=bool)
    free[np.unique(space.bedge_dofs)] = False
    free2 = jnp.asarray(np.stack([free, free]))
    A2 = jnp.stack([A_el, 2.0 * A_el])
    diag2 = jnp.stack([
        FA.constrained_diagonal(A_el, vt.dofmap, space.ndof, jnp.asarray(free)),
        FA.constrained_diagonal(2.0 * A_el, vt.dofmap, space.ndof,
                                jnp.asarray(free))])
    ctx = make_amg_context(vt.dofmap, space.ndof, free2, target_coarse=32,
                           dof_coords=coords)
    Mb = two_level_precond(A2, ctx, diag2, free=free2)
    rng = np.random.RandomState(3)
    r2 = jnp.asarray(rng.standard_normal((2, space.ndof))) * free2
    zb = Mb(r2)
    for s in range(2):
        Ms = two_level_precond(A2[s], ctx, diag2[s], free=jnp.asarray(free))
        np.testing.assert_allclose(np.asarray(Ms(r2[s])), np.asarray(zb[s]),
                                   rtol=1e-12, atol=1e-13)


def test_constrained_operator_identity_rows(poisson_system):
    space, vt, A_el, free, op, diag, b = poisson_system
    x = jnp.asarray(np.random.RandomState(1).standard_normal(space.ndof))
    y = op(x)
    np.testing.assert_allclose(np.asarray(y)[~np.asarray(free)],
                               np.asarray(x)[~np.asarray(free)])


def test_newton_reassemble_threshold_skips_builds():
    """PDELab setReassembleThreshold semantics (reference binding
    src/instationary_pnp_from_pb_md.hh:218): with a threshold, fast-
    converging Newton iterations reuse the stale Jacobian/preconditioner;
    the converged field is unchanged (correctness lives in the residual)."""
    import dataclasses as dc
    from pnp_tpu.config import read_config
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.pb import solve_pb

    cfg = read_config("/root/reference/test/one_wall_dh/one_wall.cfg")
    cfg.verbosity = 0
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    base = solve_pb(cfg, space)                      # threshold 0: always
    assert base.jacobian_builds == base.iterations

    cfg_reuse = dc.replace(cfg, newtonReassembleThreshold=0.8)
    reuse = solve_pb(cfg_reuse, space)
    assert reuse.converged
    assert reuse.jacobian_builds < base.jacobian_builds, (
        reuse.jacobian_builds, base.jacobian_builds)
    np.testing.assert_allclose(np.asarray(reuse.u), np.asarray(base.u),
                               rtol=0, atol=5e-6)

"""Dense f32-LU + f64-refinement direct solver tests (solvers/direct.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pnp_tpu.fem import assembly as FA
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.fem.geometry import build_volume_tables
from pnp_tpu.meshio.structured import rect_mesh
from pnp_tpu.operators import volume as V
from pnp_tpu.operators.common import interp_grad
from pnp_tpu.solvers.direct import batched_lu_factor_f32, make_lu_refine_solver


@pytest.fixture(scope="module")
def advective_pair():
    """Two strongly advective stage matrices M + dt K(phi), Peclet >> 1."""
    mesh = rect_mesh(16, 16, 1.0, 1.0)
    space = FunctionSpace(mesh, 1)
    vt = build_volume_tables(space, 3)
    # steep potential ramp -> drift dominates diffusion
    phi = jnp.asarray(40.0 * space.dof_coords[:, 0])
    gphi = interp_grad(phi[vt.dofmap], vt.gradphi)
    M = V.mass_jacobian_el(vt)
    Kp = V.drift_diffusion_jacobian_el(gphi, vt, +1.0)
    Km = V.drift_diffusion_jacobian_el(gphi, vt, -1.0)
    dt = 0.5
    A_pair = jnp.stack([M + dt * Kp, M + dt * Km])
    free = np.ones(space.ndof, dtype=bool)
    free[np.unique(space.bedge_dofs)] = False
    free_pair = jnp.asarray(np.stack([free, free]))
    return space, vt, A_pair, free_pair


def test_refined_solve_reaches_f64_tolerance(advective_pair):
    space, vt, A_pair, free_pair = advective_pair
    A_dense = FA.dense_constrained_matrix_batched(
        A_pair, vt.dofmap, space.ndof, free_pair)
    lu_piv = batched_lu_factor_f32(A_dense)
    solve = make_lu_refine_solver(lu_piv, A_pair, vt.dofmap, space.ndof,
                                  free_pair)
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.standard_normal((2, space.ndof))) * free_pair
    for red in (1e-5, 1e-10):
        x, k = solve(r, red)
        op = FA.make_constrained_operator_batched(
            A_pair, vt.dofmap, space.ndof, free_pair)
        res = np.asarray(r - op(x))
        rel = np.linalg.norm(res, axis=1) / np.linalg.norm(np.asarray(r), axis=1)
        assert (rel <= red * 1.01).all(), (red, rel, int(k))
        assert int(k) < 20
    # constrained rows untouched (x = 0 there since r = 0 there)
    np.testing.assert_allclose(
        np.asarray(x)[~np.asarray(free_pair)], 0.0, atol=1e-12)


def test_dense_matrix_matches_operator(advective_pair):
    space, vt, A_pair, free_pair = advective_pair
    A_dense = FA.dense_constrained_matrix_batched(
        A_pair, vt.dofmap, space.ndof, free_pair)
    op = FA.make_constrained_operator_batched(
        A_pair, vt.dofmap, space.ndof, free_pair)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.standard_normal((2, space.ndof)))
    y_dense = jnp.einsum("sij,sj->si", A_dense, x)
    np.testing.assert_allclose(np.asarray(y_dense), np.asarray(op(x)),
                               rtol=1e-12, atol=1e-12)

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


def test_scaled_inverse_refine_solver():
    """The very-large-N tier never unscales its inverse: the (X_eq, s)
    pair (X_eq = inv(S A S)) threaded through make_inv_refine_solver_arg
    must solve to the same answer as the plain inverse (solvers/direct.py:
    scaled_inv_apply)."""
    import numpy as np
    import jax.numpy as jnp
    from pnp_tpu.fem import assembly as FA
    from pnp_tpu.fem.geometry import build_volume_tables
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio.structured import rect_mesh
    from pnp_tpu.operators import volume as V
    from pnp_tpu.solvers.direct import make_inv_refine_solver_arg

    mesh = rect_mesh(12, 12, 1.0, 1.0)
    space = FunctionSpace(mesh, 1)
    vt = build_volume_tables(space, 2)
    A_el = V.laplace_jacobian_el(vt) + 0.3 * V.mass_jacobian_el(
        vt, 1.0, False, np.pi)
    onb = np.zeros(space.ndof, bool)
    onb[np.unique(mesh.edges)] = True
    free = jnp.asarray(~onb)
    ndof = space.ndof
    A = np.asarray(FA.dense_constrained_matrix(A_el, vt.dofmap, ndof, free))
    s = 1.0 / np.sqrt(np.abs(np.diag(A)))
    X_eq = np.linalg.inv(s[:, None] * A * s[None, :]).astype(np.float32)
    X_plain = np.linalg.inv(A).astype(np.float32)

    solve = make_inv_refine_solver_arg(A_el[None].astype(jnp.float64),
                                       vt.dofmap, ndof, free[None])
    r = jnp.where(free, jnp.ones(ndof), 0.0)[None]
    x_p, k_p = solve(jnp.asarray(X_plain)[None], r, 1e-12)
    x_s, k_s = solve((jnp.asarray(X_eq)[None],
                      jnp.asarray(s, jnp.float32)), r, 1e-12)
    want = np.linalg.solve(A, np.asarray(r[0]))
    np.testing.assert_allclose(np.asarray(x_p[0]), want, atol=1e-10)
    np.testing.assert_allclose(np.asarray(x_s[0]), want, atol=1e-10)
    assert int(k_s) <= int(k_p) + 2


def test_chunked_equilibrated_assembly_matches_dense(ref_test_dir):
    """The very-large tier assembles S A S in row chunks via donated
    dynamic_update_slice (workloads/instationary_pnp_from_pb.py). Pin the
    chunk math against the one-shot dense assembly — including the
    negative-scatter-index WRAP gotcha (jax wraps python-style BEFORE the
    mode='drop' check; unmasked ``dofmap - r0`` scattered every element
    one chunk below its true row)."""
    import functools
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pnp_tpu.config import read_config
    from pnp_tpu.fem import assembly as FA
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.operators import volume as V
    from pnp_tpu.workloads.common import make_scalar_context

    cfg = read_config(str(ref_test_dir / "pore_pnp/pore.cfg"))
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    ndof = space.ndof
    ctx_phi = make_scalar_context(cfg, space, component=0, quad_order=3)
    vt_phi = ctx_phi.vt
    A_el = V.poisson_jacobian_el(vt_phi, cfg.cylindrical, cfg.pi)
    f32 = jnp.float32
    Np = ((ndof + 127) // 128) * 128
    rows_c = Np // 8
    d = FA.constrained_diagonal(A_el, vt_phi.dofmap, ndof, ctx_phi.free)
    sc = jax.lax.rsqrt(jnp.maximum(jnp.abs(d), 1e-30)).astype(f32)
    free32 = ctx_phi.free.astype(f32)
    w_el = (free32 * sc)[vt_phi.dofmap]
    Am = A_el.astype(f32) * w_el[:, :, None] * w_el[:, None, :]
    bump = jnp.ones(Np, f32).at[:ndof].set(1.0 - free32)

    @functools.partial(jax.jit, donate_argnums=0)
    def chunk(A_, Am_, bump_, r0):
        ir = jnp.where((vt_phi.dofmap >= r0)
                       & (vt_phi.dofmap < r0 + rows_c),
                       vt_phi.dofmap - r0, rows_c)
        Ch = jnp.zeros((rows_c, Np), f32).at[
            ir[:, :, None], vt_phi.dofmap[:, None, :]].add(Am_, mode="drop")
        ix = jnp.arange(rows_c)
        db = jax.lax.dynamic_slice(bump_, (r0,), (rows_c,))
        Ch = Ch.at[ix, r0 + ix].add(db, mode="drop")
        z0 = jnp.int32(0)
        old = jax.lax.dynamic_slice(A_, (z0, r0, z0), (1, rows_c, Np))
        return jax.lax.dynamic_update_slice(A_, old + Ch[None], (z0, r0, z0))

    A_eq = jnp.zeros((1, Np, Np), f32)
    for c in range(8):
        A_eq = chunk(A_eq, Am, bump, jnp.int32(c * rows_c))
    got = np.asarray(A_eq[0], np.float64)
    A_ref = np.asarray(FA.dense_constrained_matrix(A_el, vt_phi.dofmap,
                                                   ndof, ctx_phi.free))
    s_np = np.asarray(sc, np.float64)
    ref = np.zeros((Np, Np))
    ref[:ndof, :ndof] = s_np[:, None] * A_ref * s_np[None, :]
    ref[range(ndof, Np), range(ndof, Np)] = 1.0
    assert np.abs(got - ref).max() < 1e-5


def test_contraction_probe_rough_vector_blind_spot():
    """The r3 smooth-only probe's documented blind spot (VERDICT r3 item
    8): a preconditioner whose refinement contracts on smooth vectors but
    diverges on rough residuals must now FAIL the probe.

    Construction: A = I, X = I + e0 f^T with f alternating +-1 (so
    f . 1 = 0). The refinement error operator is I - X A = -e0 f^T:
    exactly zero on the all-ones probe (smooth passes with r1 = 0), but
    amplifies alternating-sign residuals by |f . v| = N >> 1."""
    import jax
    from pnp_tpu.solvers.direct import contraction_ok, probe_vectors

    N = 64
    A = jnp.eye(N, dtype=jnp.float32)[None]
    f = jnp.where(jnp.arange(N) % 2 == 0, 1.0, -1.0).astype(jnp.float32)
    X = (jnp.eye(N, dtype=jnp.float32)
         + jnp.zeros(N).at[0].set(1.0)[:, None] * f[None, :])[None]

    # smooth-only check (the r3 probe) PASSES this matrix...
    hi = jax.lax.Precision.HIGHEST
    mv = lambda M, v: jnp.einsum("sij,sj->si", M, v, precision=hi)
    b = mv(A, jnp.ones((1, N), jnp.float32))
    r1 = b - mv(A, mv(X, b))
    r2 = r1 - mv(A, mv(X, r1))
    assert float(jnp.linalg.norm(r2)) <= 0.25 * float(jnp.linalg.norm(b))

    # ...the smooth+rough probe rejects it
    assert not bool(contraction_ok(A, X))
    # and still accepts an honest inverse
    assert bool(contraction_ok(A, jnp.eye(N, dtype=jnp.float32)[None]))
    # probe vector set: smooth + alternating rough
    vs = probe_vectors(N)
    assert vs.shape == (2, N)
    assert float(jnp.abs(vs[1][:-1] + vs[1][1:]).max()) == 0.0

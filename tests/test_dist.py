"""Owner-partitioned DistContext + Schwarz block-LU preconditioner.

Runs on 8 virtual CPU devices. Validates the v2 distribution substrate
(batched halo-exchange SpMV, element gather/scatter, constrained
operators) against the single-device dense operator, and the restricted
additive Schwarz preconditioner both algebraically (one application vs a
numpy subdomain solve) and as a Krylov accelerator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_tpu.fem import assembly as FA
from pnp_tpu.fem.geometry import build_volume_tables
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio.structured import rect_mesh
from pnp_tpu.operators import volume as V
from pnp_tpu.parallel.dist import build_dist_context
from pnp_tpu.parallel.sharding import make_device_mesh
from pnp_tpu.solvers import schwarz as SW
from pnp_tpu.solvers.krylov import bicgstab, cg

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def system():
    mesh = rect_mesh(24, 16, 2.0, 1.0)
    space = FunctionSpace(mesh, 1)
    vt = build_volume_tables(space, 2)
    A_el = np.asarray(V.laplace_jacobian_el(vt) + 0.1 * V.mass_jacobian_el(vt))
    return mesh, space, vt, A_el


@pytest.fixture(scope="module")
def ctx8(system):
    mesh, space, vt, A_el = system
    return build_dist_context(space, make_device_mesh(8))


def _free_mask(ctx, mesh, space):
    bnd = np.zeros(space.ndof, bool)
    bnd[np.unique(np.asarray(mesh.edges))] = True
    free = ctx.pad_mask_flat() & ~ctx.partition(bnd.astype(np.int8)).astype(bool)
    return ctx.put_sharded(jnp.asarray(free))


@needs_8
def test_partition_roundtrip_and_elem(system, ctx8):
    mesh, space, vt, A_el = system
    rng = np.random.RandomState(0)
    x = rng.standard_normal(space.ndof)
    np.testing.assert_array_equal(ctx8.unpartition(ctx8.partition(x)), x)
    # element partition places every element exactly once
    e_flat = ctx8.partition_elem(np.arange(1, space.mesh.num_tris + 1))
    vals = e_flat[e_flat != 0]
    assert sorted(vals.tolist()) == list(range(1, space.mesh.num_tris + 1))


@needs_8
def test_spmv_matches_dense_and_batched(system, ctx8):
    mesh, space, vt, A_el = system
    A_flat = ctx8.put_sharded(jnp.asarray(ctx8.partition_elem(A_el)))
    rng = np.random.RandomState(1)
    x = rng.standard_normal(space.ndof)
    xp = ctx8.put_sharded(jnp.asarray(ctx8.partition(x)))
    y_ref = np.asarray(FA.spmv(jnp.asarray(A_el), jnp.asarray(x),
                               vt.dofmap, space.ndof))
    np.testing.assert_allclose(ctx8.unpartition(np.asarray(ctx8.spmv(A_flat, xp))),
                               y_ref, rtol=1e-12, atol=1e-12)
    # batched (S=3): stack of systems, same element blocks
    xs = rng.standard_normal((3, space.ndof))
    xsp = ctx8.put_sharded(jnp.asarray(np.stack([ctx8.partition(v) for v in xs])),
                           axis=1)
    ys = np.asarray(ctx8.spmv(jnp.broadcast_to(A_flat, (3,) + A_flat.shape), xsp))
    for s in range(3):
        y_ref_s = np.asarray(FA.spmv(jnp.asarray(A_el), jnp.asarray(xs[s]),
                                     vt.dofmap, space.ndof))
        np.testing.assert_allclose(ctx8.unpartition(ys[s]), y_ref_s,
                                   rtol=1e-12, atol=1e-12)


@needs_8
def test_diagonal_matches(system, ctx8):
    mesh, space, vt, A_el = system
    A_flat = ctx8.put_sharded(jnp.asarray(ctx8.partition_elem(A_el)))
    d = ctx8.unpartition(np.asarray(ctx8.diagonal(A_flat)))
    d_ref = np.asarray(FA.scatter_add(
        jnp.einsum("eii->ei", jnp.asarray(A_el)), vt.dofmap, space.ndof))
    np.testing.assert_allclose(d, d_ref, rtol=1e-12, atol=1e-12)


@needs_8
def test_local_matrices_are_true_submatrix(system, ctx8):
    """env=True local matrices equal the dense A[loc, loc] restriction."""
    mesh, space, vt, A_el = system
    plan = ctx8.plan
    N, K = space.ndof, plan.K
    dofmap = np.asarray(vt.dofmap)
    A = np.zeros((N, N))
    for e in range(len(dofmap)):
        d = dofmap[e]
        A[np.ix_(d, d)] += A_el[e]
    free = _free_mask(ctx8, mesh, space)
    freeg = np.zeros(N, bool)
    m = plan.owned_global >= 0
    freeg[plan.owned_global[m]] = np.asarray(free).reshape(K, -1)[m]

    A_flat = ctx8.put_sharded(jnp.asarray(ctx8.partition_elem(A_el)))
    A_loc = np.asarray(SW.build_local_matrices(ctx8, A_flat, free,
                                               rel_shift=0.0))
    L = plan.B_N + plan.B_H
    # reconstruct loc->glob
    loc2glob = -np.ones((K, L), dtype=np.int64)
    loc2glob[:, :plan.B_N] = plan.owned_global
    for s in range(K):
        for e_loc, e in enumerate(plan.elem_ids[s]):
            if e < 0:
                continue
            loc2glob[s, plan.dofmap_local[s, e_loc]] = dofmap[e]
    for s in range(K):
        g = loc2glob[s]
        valid = (g >= 0) & np.where(g >= 0, freeg[np.maximum(g, 0)], False)
        ref = np.zeros((L, L))
        ref[np.ix_(valid, valid)] = A[np.ix_(g[valid], g[valid])]
        ref += np.diag(~valid * 1.0)
        np.testing.assert_allclose(A_loc[s], ref, rtol=1e-12, atol=1e-12)


@needs_8
def test_schwarz_accelerates_krylov(system, ctx8):
    mesh, space, vt, A_el = system
    A_flat = ctx8.put_sharded(jnp.asarray(ctx8.partition_elem(A_el)))
    free = _free_mask(ctx8, mesh, space)
    op = ctx8.make_constrained_operator(A_flat, free)
    rng = np.random.RandomState(2)
    b = jnp.where(free, ctx8.put_sharded(
        jnp.asarray(ctx8.partition(rng.standard_normal(space.ndof)))), 0.0)
    x0 = jnp.zeros_like(b)

    M_ras = SW.make_schwarz_precond(ctx8, A_flat, free, restricted=True)
    M_asm = SW.make_schwarz_precond(ctx8, A_flat, free, restricted=False)

    base = bicgstab(op, b, x0, reduction=1e-10, maxiter=500)
    ras = bicgstab(op, b, x0, precond=M_ras, reduction=1e-10, maxiter=500)
    asm = cg(op, b, x0, precond=M_asm, reduction=1e-10, maxiter=500)
    for res in (base, ras, asm):
        assert bool(res.converged)
        r = b - op(res.x)
        assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-9
    # exact-subdomain RAS must be a strong accelerator, not a tweak
    assert int(ras.iterations) < int(base.iterations) / 2
    assert int(asm.iterations) < int(base.iterations)


@needs_8
def test_schwarz_batched_systems(system, ctx8):
    """Batched (S, Kb) stacks: per-system local factors, one solve call."""
    mesh, space, vt, A_el = system
    S = 2
    A2 = np.stack([A_el, 2.5 * A_el])
    A_flat = ctx8.put_sharded(
        jnp.asarray(np.stack([ctx8.partition_elem(a) for a in A2])), axis=1)
    free1 = _free_mask(ctx8, mesh, space)
    free = jnp.broadcast_to(free1, (S,) + free1.shape)
    op = ctx8.make_constrained_operator(A_flat, free)
    rng = np.random.RandomState(3)
    b = jnp.where(free, ctx8.put_sharded(jnp.asarray(np.stack(
        [ctx8.partition(rng.standard_normal(space.ndof)) for _ in range(S)])),
        axis=1), 0.0)
    M = SW.make_schwarz_precond(ctx8, A_flat, free, restricted=True)
    res = bicgstab(op, b, jnp.zeros_like(b), precond=M,
                   reduction=1e-10, maxiter=500)
    assert bool(jnp.all(res.converged))
    r = b - op(res.x)
    rel = np.linalg.norm(np.asarray(r), axis=1) / np.linalg.norm(
        np.asarray(b), axis=1)
    assert (rel < 1e-9).all()


@needs_8
def test_nonlinear_gather_scatter_pb_residual(system, ctx8):
    """gather_elem + scatter_elem reproduce the assembled PB residual."""
    mesh, space, vt, A_el = system
    plan = ctx8.plan
    gradphi = ctx8.put_sharded(jnp.asarray(
        ctx8.partition_elem(np.asarray(vt.gradphi))))
    qw = ctx8.put_sharded(jnp.asarray(ctx8.partition_elem(np.asarray(vt.qw))))
    shape_tbl = jnp.asarray(vt.shape)
    l_b, c0 = 1.0, 0.06

    rng = np.random.RandomState(4)
    x = rng.uniform(-0.5, 0.5, space.ndof)
    xp = ctx8.put_sharded(jnp.asarray(ctx8.partition(x)))
    xe = ctx8.gather_elem(xp)                           # (K*B_E, n)
    u = jnp.einsum("ei,qi->eq", xe, shape_tbl)
    gu = jnp.einsum("ei,eqid->eqd", xe, gradphi)
    re = jnp.einsum("eqd,eqid,eq->ei", gu, gradphi, qw)
    re += jnp.einsum("eq,qi,eq->ei",
                     8.0 * np.pi * l_b * c0 * jnp.sinh(u), shape_tbl, qw)
    r = ctx8.unpartition(np.asarray(ctx8.scatter_elem(re)))

    r_el = V.pb_residual_el(jnp.asarray(x)[vt.dofmap], vt, l_b, c0,
                            False, np.pi)
    r_ref = np.asarray(FA.scatter_add(r_el, vt.dofmap, space.ndof))
    np.testing.assert_allclose(r, r_ref, rtol=1e-11, atol=1e-12)

"""Owner-partitioned halo-exchange SpMV vs the single-device operator.

Runs on 8 virtual CPU devices; validates the packed per-pair halo exchange
(forward halo fetch + backward additive return) and partitioned dots.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_tpu.fem import assembly as FA
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.fem.geometry import build_volume_tables
from pnp_tpu.meshio.structured import rect_mesh
from pnp_tpu.operators import volume as V
from pnp_tpu.parallel.sharding import make_device_mesh
from pnp_tpu.parallel.halo import (
    build_halo_plan, partition_vector, unpartition_vector,
    make_sharded_spmv, device_put_plan)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def system():
    mesh = rect_mesh(20, 14, 2.0, 1.0)
    space = FunctionSpace(mesh, 1)
    vt = build_volume_tables(space, 2)
    A_el = V.laplace_jacobian_el(vt) + 0.3 * V.mass_jacobian_el(vt)
    return space, vt, A_el


@needs_8
@pytest.mark.parametrize("K", [2, 4, 8])
def test_sharded_spmv_matches_dense(system, K):
    space, vt, A_el = system
    plan = build_halo_plan(np.asarray(vt.dofmap), space.ndof, K)
    mesh = make_device_mesh(K)
    args = device_put_plan(plan, mesh, np.asarray(A_el))
    spmv, dot = make_sharded_spmv(plan, mesh, *args)

    rng = np.random.RandomState(0)
    x = rng.standard_normal(space.ndof)
    xp = jax.device_put(jnp.asarray(partition_vector(plan, x)),
                        jax.sharding.NamedSharding(
                            mesh, jax.sharding.PartitionSpec("e")))
    y_sharded = unpartition_vector(plan, np.asarray(spmv(xp)))
    y_ref = np.asarray(FA.spmv(A_el, jnp.asarray(x), vt.dofmap, space.ndof))
    np.testing.assert_allclose(y_sharded, y_ref, rtol=1e-12, atol=1e-12)

    # partitioned dot == global dot
    got = float(dot(xp, xp))
    assert got == pytest.approx(float(x @ x), rel=1e-13)


@needs_8
def test_partition_roundtrip(system):
    space, vt, A_el = system
    plan = build_halo_plan(np.asarray(vt.dofmap), space.ndof, 8)
    x = np.random.RandomState(1).standard_normal(space.ndof)
    np.testing.assert_array_equal(
        unpartition_vector(plan, partition_vector(plan, x)), x)
    # every dof owned exactly once
    owned = plan.owned_global[plan.owned_global >= 0]
    assert sorted(owned.tolist()) == list(range(space.ndof))


@needs_8
def test_sharded_cg_solves(system):
    """CG built on the partitioned primitives reaches the same solution."""
    space, vt, A_el = system
    K = 8
    plan = build_halo_plan(np.asarray(vt.dofmap), space.ndof, K)
    mesh = make_device_mesh(K)
    args = device_put_plan(plan, mesh, np.asarray(A_el))
    spmv, dot = make_sharded_spmv(plan, mesh, *args)

    rng = np.random.RandomState(2)
    b = rng.standard_normal(space.ndof)
    bp = jnp.asarray(partition_vector(plan, b))

    x = jnp.zeros_like(bp)
    r = bp - spmv(x)
    p = r
    rz = dot(r, r)
    for _ in range(400):
        Ap = spmv(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rz_new = dot(r, r)
        if float(rz_new) < 1e-24:
            break
        p = r + (rz_new / rz) * p
        rz = rz_new
    xg = unpartition_vector(plan, np.asarray(x))
    res = b - np.asarray(FA.spmv(A_el, jnp.asarray(xg), vt.dofmap, space.ndof))
    assert np.linalg.norm(res) < 1e-9 * np.linalg.norm(b)


@needs_8
def test_sharded_nonlinear_residual_assembly(system):
    """The generalized assembler reproduces the PB residual (nonlinear)."""
    from pnp_tpu.parallel.halo import (
        make_sharded_assembler, partition_element_array)
    import jax.tree_util as jtu
    space, vt, A_el = system
    K = 8
    plan = build_halo_plan(np.asarray(vt.dofmap), space.ndof, K)
    mesh = make_device_mesh(K)
    esh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("e"))
    put = lambda a: jax.device_put(jnp.asarray(a), esh)

    # shard the PB volume tables per the plan
    gradphi_s = put(partition_element_array(plan, np.asarray(vt.gradphi)))
    qw_s = put(partition_element_array(plan, np.asarray(vt.qw)))
    qy_s = put(partition_element_array(plan, np.asarray(vt.qy)))
    shape_tbl = jnp.asarray(vt.shape)
    l_b, c0, pi = 1.0, 0.06, np.pi

    def kernel(xe):   # (K, B_E, n) -> (K, B_E, n): PB volume residual
        u = jnp.einsum("kei,qi->keq", xe, shape_tbl)
        gu = jnp.einsum("kei,keqid->keqd", xe, gradphi_s)
        f = qw_s
        r = jnp.einsum("keqd,keqid,keq->kei", gu, gradphi_s, f)
        r += jnp.einsum("keq,qi,keq->kei",
                        8.0 * pi * l_b * c0 * jnp.sinh(u), shape_tbl, f)
        return r

    assemble = make_sharded_assembler(
        plan, mesh, put(plan.dofmap_local), put(plan.send_idx),
        put(plan.recv_pos))

    rng = np.random.RandomState(3)
    x = rng.uniform(-0.5, 0.5, space.ndof)
    xp = put(partition_vector(plan, x))
    r_sharded = unpartition_vector(plan, np.asarray(assemble(xp, kernel)))

    from pnp_tpu.operators import volume as V
    from pnp_tpu.fem import assembly as FA
    r_el = V.pb_residual_el(jnp.asarray(x)[vt.dofmap], vt, l_b, c0,
                            False, pi)
    r_ref = np.asarray(FA.scatter_add(r_el, vt.dofmap, space.ndof))
    np.testing.assert_allclose(r_sharded, r_ref, rtol=1e-11, atol=1e-12)

"""Uniform red refinement: structure, geometry, and solution convergence.

The refined-mesh family is the scaling substrate for the large-mesh solver
path (the reference regenerates meshes through Gmsh .geo files; our
rebuild refines the shipped .msh fixtures in code, meshio/refine.py).
"""

import numpy as np
import pytest

from pnp_tpu.meshio import read_gmsh
from pnp_tpu.meshio.refine import refine_uniform
from pnp_tpu.meshio.structured import rect_mesh


def _area(mesh):
    x = mesh.nodes[mesh.tris]
    det = (x[:, 1, 0] - x[:, 0, 0]) * (x[:, 2, 1] - x[:, 0, 1]) - (
        x[:, 2, 0] - x[:, 0, 0]) * (x[:, 1, 1] - x[:, 0, 1])
    return det.sum() / 2.0


def test_refine_counts_and_area(ref_test_dir):
    mesh = read_gmsh(str(ref_test_dir / "one_wall_dh/one_wall.msh"))
    r1 = refine_uniform(mesh, 1)
    assert r1.num_tris == 4 * mesh.num_tris
    assert r1.num_boundary_edges == 2 * mesh.num_boundary_edges
    # Euler: new nodes = unique edges = (3E + B) / 2
    n_edges = (3 * mesh.num_tris + mesh.num_boundary_edges) // 2
    assert r1.num_nodes == mesh.num_nodes + n_edges
    assert _area(r1) == pytest.approx(_area(mesh), rel=1e-12)
    # physical groups preserved with multiplicity
    for g in np.unique(mesh.edge_phys):
        assert (r1.edge_phys == g).sum() == 2 * (mesh.edge_phys == g).sum()
    r2 = refine_uniform(mesh, 2)
    assert r2.num_tris == 16 * mesh.num_tris
    r2.validate()


def test_refine_pore_family(ref_test_dir):
    """The scaled-bench family: pore_pnp at ~12k nodes after one level."""
    mesh = read_gmsh(str(ref_test_dir / "pore_pnp/pore.msh"))
    r1 = refine_uniform(mesh, 1)
    assert r1.num_tris == 4 * mesh.num_tris
    assert 11500 < r1.num_nodes < 12400
    assert set(np.unique(r1.edge_phys)) == set(np.unique(mesh.edge_phys))
    assert _area(r1) == pytest.approx(_area(mesh), rel=1e-12)


def test_refined_solution_converges():
    """P1 Laplace on the unit square: refinement halves h, error drops 4x."""
    import jax.numpy as jnp
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.fem.geometry import build_volume_tables
    from pnp_tpu.fem import assembly as FA
    from pnp_tpu.operators import volume as V
    from pnp_tpu.solvers.krylov import cg

    base = rect_mesh(4, 4, 1.0, 1.0)
    errs = []
    for lev in (0, 1, 2):
        mesh = refine_uniform(base, lev)
        space = FunctionSpace(mesh, 1)
        vt = build_volume_tables(space, 2)
        A_el = V.laplace_jacobian_el(vt)
        # u = sin(pi x) sin(pi y), -lap u = 2 pi^2 u, u = 0 on the boundary
        # (non-polynomial: avoids the 5-point-stencil superconvergence that
        # makes quadratic solutions node-exact on structured meshes)
        xy = space.dof_coords
        exact = np.sin(np.pi * xy[:, 0]) * np.sin(np.pi * xy[:, 1])
        onb = np.zeros(space.ndof, bool)
        onb[np.unique(mesh.edges)] = True
        free = jnp.asarray(~onb)
        # f at quadrature points via nodal interpolation of exact (O(h^2)
        # consistent, enough for the ratio check)
        f_q = jnp.einsum("ei,qi->eq", jnp.asarray(exact)[vt.dofmap],
                         vt.shape) * (2.0 * np.pi ** 2)
        f_el = jnp.einsum("eq,eq,qi->ei", f_q, vt.qw, vt.shape)
        b = FA.scatter_add(f_el, vt.dofmap, space.ndof)
        g = jnp.asarray(np.where(onb, exact, 0.0))
        b = b - FA.spmv(A_el, g, vt.dofmap, space.ndof)
        op = FA.make_constrained_operator(A_el, vt.dofmap, space.ndof, free)
        res = cg(op, jnp.where(free, b, 0.0), jnp.zeros(space.ndof),
                 reduction=1e-12, maxiter=2000)
        u = jnp.where(free, res.x, g)
        errs.append(float(jnp.max(jnp.abs(u - exact))))
    # quadratic: each level divides the max error by ~4 (P1 is exact only
    # for linears; this u is quadratic, interpolation error O(h^2))
    assert errs[1] < 0.3 * errs[0]
    assert errs[2] < 0.3 * errs[1]

"""FEM core unit tests: quadrature exactness, nodal bases, element matrices.

Validation strategy per SURVEY.md section 4: hand-computed element matrices
(unit-triangle P1 Laplace stiffness and mass), polynomial quadrature
exactness, partition of unity, and Kronecker-delta nodal property.
"""

import numpy as np
import pytest

from pnp_tpu.fem.quadrature import triangle_rule, interval_rule
from pnp_tpu.fem.reference import ReferenceTriangle
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.fem.geometry import build_volume_tables
from pnp_tpu.meshio.mesh import Mesh, build_edge_adjacency
from pnp_tpu.operators.volume import stiffness_matrix, mass_matrix


def unit_square_mesh():
    """Two right triangles covering the unit square."""
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    tris = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0]], dtype=np.int32)
    edge_tri, edge_local = build_edge_adjacency(tris, edges)
    return Mesh(nodes=nodes, tris=tris,
                tri_phys=np.zeros(2, np.int32),
                edges=edges, edge_phys=np.arange(4, dtype=np.int32),
                edge_tri=edge_tri, edge_local=edge_local)


@pytest.mark.parametrize("order", [1, 2, 3, 4, 5, 8])
def test_triangle_quadrature_exactness(order):
    pts, wts = triangle_rule(order)
    assert wts.sum() == pytest.approx(0.5, abs=1e-14)
    # exact integration of x^a y^b for a+b <= order:
    # int over ref triangle = a! b! / (a+b+2)!
    from math import factorial
    for a in range(order + 1):
        for b in range(order + 1 - a):
            got = (wts * pts[:, 0] ** a * pts[:, 1] ** b).sum()
            want = factorial(a) * factorial(b) / factorial(a + b + 2)
            assert got == pytest.approx(want, rel=2e-12, abs=1e-15), (a, b)


@pytest.mark.parametrize("order", [1, 2, 3, 5, 7])
def test_interval_quadrature(order):
    t, w = interval_rule(order)
    for k in range(order + 1):
        assert (w * t ** k).sum() == pytest.approx(1.0 / (k + 1), rel=1e-13)


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_nodal_basis_property(degree):
    ref = ReferenceTriangle(degree)
    vals = ref.values(ref.dof_ref_coords)
    np.testing.assert_allclose(vals, np.eye(ref.ndof), atol=1e-13)


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_partition_of_unity_and_gradients(degree):
    ref = ReferenceTriangle(degree)
    pts, _ = triangle_rule(4)
    np.testing.assert_allclose(ref.values(pts).sum(axis=1), 1.0, atol=1e-13)
    np.testing.assert_allclose(ref.gradients(pts).sum(axis=1), 0.0, atol=1e-12)
    # finite-difference check of gradients
    h = 1e-7
    g = ref.gradients(pts)
    gx = (ref.values(pts + [h, 0]) - ref.values(pts - [h, 0])) / (2 * h)
    gy = (ref.values(pts + [0, h]) - ref.values(pts - [0, h])) / (2 * h)
    np.testing.assert_allclose(g[..., 0], gx, atol=1e-6)
    np.testing.assert_allclose(g[..., 1], gy, atol=1e-6)


def test_p1_element_matrices_unit_triangle():
    """Hand-computed P1 stiffness/mass on the unit right triangle."""
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    tris = np.array([[0, 1, 2]], dtype=np.int32)
    edges = np.array([[0, 1], [1, 2], [2, 0]], dtype=np.int32)
    et, el = build_edge_adjacency(tris, edges)
    mesh = Mesh(nodes, tris, np.zeros(1, np.int32), edges,
                np.zeros(3, np.int32), et, el)
    space = FunctionSpace(mesh, 1)
    t = build_volume_tables(space, 2)
    K = np.asarray(stiffness_matrix(t, t.qw))[0]
    K_exact = 0.5 * np.array([[2.0, -1.0, -1.0], [-1.0, 1.0, 0.0], [-1.0, 0.0, 1.0]])
    np.testing.assert_allclose(K, K_exact, atol=1e-14)
    M = np.asarray(mass_matrix(t, t.qw))[0]
    M_exact = np.array([[2, 1, 1], [1, 2, 1], [1, 1, 2]]) / 24.0
    np.testing.assert_allclose(M, M_exact, atol=1e-14)


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_stiffness_annihilates_constants_and_is_exact_on_linears(degree):
    mesh = unit_square_mesh()
    space = FunctionSpace(mesh, degree)
    t = build_volume_tables(space, 2 * degree)
    K = np.asarray(stiffness_matrix(t, t.qw))
    ones = np.ones(space.ref.ndof)
    np.testing.assert_allclose(K @ ones, 0.0, atol=1e-13)
    # energy of u = x over the square is int |grad u|^2 = 1
    u = space.dof_coords[:, 0]
    ue = u[np.asarray(space.dofmap)]
    energy = np.einsum("ei,eij,ej->", ue, K, ue)
    assert energy == pytest.approx(1.0, rel=1e-12)


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_mass_matrix_total(degree):
    mesh = unit_square_mesh()
    space = FunctionSpace(mesh, degree)
    t = build_volume_tables(space, 2 * degree + 1)
    M = np.asarray(mass_matrix(t, t.qw))
    ones_e = np.ones((2, space.ref.ndof))
    total = np.einsum("ei,eij,ej->", ones_e, M, ones_e)
    assert total == pytest.approx(1.0, rel=1e-12)  # area of unit square

"""End-to-end PB validation: charged wall vs Debye-Hueckel / Gouy-Chapman.

This is the rebuild's automated version of the reference's only
quantitative check (test/one_wall_dh/one_wall.gp:5-12): the potential near
a charged wall with Neumann flux j obeys

  linear (DH) limit:    phi(x) = -(j/kappa) sinh(kappa (L-x)) / cosh(kappa L)
  nonlinear (GC):       phi(x) = -2 ln[(1 + g e^-kx) / (1 - g e^-kx)],
                        4 kappa g / (1 - g^2) = j,   kappa^2 = 8 pi l_b c0

(weak-form sign convention: the +j*v boundary term means dphi/dn = -j on
the wall, so positive flux gives a negative potential well; the reference
gnuplot script plots -phi accordingly.)
"""

import numpy as np
import pytest

from pnp_tpu.config import Sysparams, Surface, read_config, DIRICHLET, NEUMANN
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio import read_gmsh
from pnp_tpu.meshio.structured import rect_mesh
from pnp_tpu.workloads.pb import solve_pb


def wall_sys(j, l_b=1.0, c0=0.06, cylindrical=False, **kw):
    s = Sysparams(n_surfaces=4, l_b=l_b, c0=c0, cylindrical=cylindrical,
                  linearSolverIterations=20000,
                  newtonReduction=1e-9, newtonMinLinearReduction=1e-8,
                  newtonMaxIterations=50, newtonLineSearchMaxIteration=500, **kw)
    s.surfaces = [
        Surface(coulombBtype=NEUMANN, coulombFlux=j),      # wall x=0
        Surface(coulombBtype=DIRICHLET, coulombPotential=0.0),  # far x=L
        Surface(coulombBtype=NEUMANN, coulombFlux=0.0),
        Surface(coulombBtype=NEUMANN, coulombFlux=0.0),
    ]
    return s


def dh_exact(x, j, kappa, L):
    return -(j / kappa) * np.sinh(kappa * (L - x)) / np.cosh(kappa * L)


def gc_exact(x, j, kappa):
    g = -2 * kappa / j + np.sqrt((2 * kappa / j) ** 2 + 1)
    E = g * np.exp(-kappa * x)
    return -2.0 * np.log((1 + E) / (1 - E))


def rel_l2(a, b):
    return np.linalg.norm(a - b) / np.linalg.norm(b)


@pytest.mark.parametrize("degree", [1, 2])
def test_dh_structured(degree):
    """Small-flux (linear regime) PB on a structured mesh vs exact DH."""
    j, L = 1e-3, 5.0
    s = wall_sys(j)
    kappa = np.sqrt(8 * np.pi * s.l_b * s.c0)
    mesh = rect_mesh(60, 4, L, 0.5)
    space = FunctionSpace(mesh, degree)
    res = solve_pb(s, space)
    assert res.converged
    phi = np.asarray(res.u)
    want = dh_exact(space.dof_coords[:, 0], j, kappa, L)
    tol = 5e-3 if degree == 1 else 5e-5
    assert rel_l2(phi, want) < tol


def test_gc_structured_nonlinear():
    """Large-flux PB vs full Gouy-Chapman (semi-infinite formula)."""
    j, L = 5.0, 8.0
    s = wall_sys(j)
    kappa = np.sqrt(8 * np.pi * s.l_b * s.c0)
    mesh = rect_mesh(400, 2, L, 0.25)
    space = FunctionSpace(mesh, 2)
    res = solve_pb(s, space)
    assert res.converged
    phi = np.asarray(res.u)
    x = space.dof_coords[:, 0]
    want = gc_exact(x, j, kappa)
    # compare away from the truncated far field
    sel = x < 5.0
    assert rel_l2(phi[sel], want[sel]) < 2e-3
    # wall potential vs analytic contact value
    g = -2 * kappa / j + np.sqrt((2 * kappa / j) ** 2 + 1)
    phi0 = -2 * np.log((1 + g) / (1 - g))
    assert abs(phi[np.argmin(x)] - phi0) < 2e-2 * abs(phi0)


def test_one_wall_reference_mesh(ref_test_dir):
    """The shipped one_wall_dh case end-to-end (cylindrical, Gmsh mesh)."""
    s = read_config(str(ref_test_dir / "one_wall_dh/one_wall.cfg"))
    mesh = read_gmsh(s.meshfile)
    space = FunctionSpace(mesh, 1)
    res = solve_pb(s, space)
    assert res.converged
    phi = np.asarray(res.u)
    kappa = np.sqrt(8 * np.pi * s.l_b * s.c0)
    x = space.dof_coords[:, 0]
    want = gc_exact(x, 0.1, kappa)
    # coarse unstructured mesh: few-percent agreement with the
    # semi-infinite GC profile (the reference's gnuplot overlay check)
    assert rel_l2(phi, want) < 5e-2
    # solution must be y-independent (axisymmetric wall problem)
    ywall = np.abs(phi[x < 1e-9])
    assert ywall.std() < 2e-3


def test_mesh_convergence_order():
    """P1 converges at O(h^2) in L2 against the DH profile."""
    j, L = 1e-3, 5.0
    s = wall_sys(j)
    kappa = np.sqrt(8 * np.pi * s.l_b * s.c0)
    errs = []
    for n in (20, 40, 80):
        # refine both directions so the y-error does not floor the rate
        mesh = rect_mesh(n, n // 10, L, 0.5)
        space = FunctionSpace(mesh, 1)
        res = solve_pb(s, space)
        phi = np.asarray(res.u)
        want = dh_exact(space.dof_coords[:, 0], j, kappa, L)
        errs.append(rel_l2(phi, want))
    rate1 = errs[0] / errs[1]
    rate2 = errs[1] / errs[2]
    assert rate1 > 3.0 and rate2 > 3.0  # ~4x per refinement


def test_dh_large_mesh_block_ras_path():
    """Analytic anchor for the LARGE-MESH solver path: a refined wall
    mesh pushes ndof past the dense threshold, so the PB Newton runs
    BiCGSTAB + overlapping block-RAS (workloads/pb.py ras_threshold) —
    the converged field must still match exact Debye-Hueckel, and refine
    once more must shrink the P1 error ~4x (O(h^2))."""
    from pnp_tpu.meshio.refine import refine_uniform

    j, L = 1e-3, 5.0
    s = wall_sys(j)
    s.linearSolver = "BCGS_SSORk"
    kappa = np.sqrt(8 * np.pi * s.l_b * s.c0)
    base = rect_mesh(60, 8, L, 0.5)
    errs = []
    for levels in (2, 3):                     # 3,9k and 15,7k dofs
        mesh = refine_uniform(base, levels)
        space = FunctionSpace(mesh, 1)
        res = solve_pb(s, space)
        assert res.converged, (levels, res.defect)
        phi = np.asarray(res.u)
        want = dh_exact(space.dof_coords[:, 0], j, kappa, L)
        errs.append(rel_l2(phi, want))
    assert errs[0] < 5e-4, errs
    assert errs[1] < errs[0] / 3.0, errs      # O(h^2) through the RAS path

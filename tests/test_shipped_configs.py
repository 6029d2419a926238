"""End-to-end runs of every shipped reference config + cross-validation.

Covers the five BASELINE.json workload configs (one_wall_dh is exercised in
test_pb_one_wall/test_instationary_driver): sphere_pb, cylinder, pore_pnp,
pore_without_dna(coarse pore mesh), and cross-validates the operator-split
production driver against the monolithic stationary Newton solve.
"""

import numpy as np
import pytest

from pnp_tpu.config import read_config, Sysparams
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio import read_gmsh
from pnp_tpu.workloads.pb import solve_pb
from pnp_tpu.workloads.stationary_pnp import run_stationary_pnp, split_fields
from pnp_tpu.workloads.instationary_pnp_from_pb import run_instationary_pnp_from_pb


def test_all_shipped_configs_parse(ref_test_dir):
    cases = {
        "sphere_pb/sphere.cfg": 5,
        "one_wall_dh/one_wall.cfg": 4,
        "cylinder_config.cfg": 3,
        "pore_pnp/pore.cfg": 7,
        "pore_without_dna/pore.cfg": 6,
    }
    for rel, n_surf in cases.items():
        cfg = read_config(str(ref_test_dir / rel))
        assert cfg.n_surfaces == n_surf
        assert len(cfg.surfaces) == n_surf
    # stale configs get defaults instead of crashing (reference would abort)
    sphere = read_config(str(ref_test_dir / "sphere_pb/sphere.cfg"))
    assert sphere.linearSolverIterations == 5000
    assert sphere.newtonMaxIterations == 50


def test_sphere_pb_end_to_end(ref_test_dir):
    cfg = read_config(str(ref_test_dir / "sphere_pb/sphere.cfg"))
    mesh = read_gmsh(cfg.meshfile)
    space = FunctionSpace(mesh, 1)
    res = solve_pb(cfg, space)
    assert res.converged
    phi = np.asarray(res.u)
    assert np.isfinite(phi).all()
    # tiny surface flux (0.001) on the sphere -> small negative potential,
    # zero at the Dirichlet far-field sides
    assert np.abs(phi).max() < 0.1
    from pnp_tpu.fem.constraints import dirichlet_dof_mask
    mask = dirichlet_dof_mask(space, cfg, 0)
    np.testing.assert_allclose(phi[mask], 0.0, atol=1e-14)


def test_cylinder_stationary_pnp(ref_test_dir):
    cfg = read_config(str(ref_test_dir / "cylinder_config.cfg"))
    mesh = read_gmsh(cfg.meshfile)
    space = FunctionSpace(mesh, 1)
    res = run_stationary_pnp(cfg, space, from_pb=True)
    assert res.converged
    phi, cp, cm = map(np.asarray, split_fields(space, res.u))
    assert np.isfinite(phi).all()
    assert cp.min() > 0 and cm.min() > 0


def test_pore_pnp_smoke(ref_test_dir):
    """The production case: PB bootstrap + 3 production steps, 3k nodes."""
    cfg = read_config(str(ref_test_dir / "pore_pnp/pore.cfg"))
    mesh = read_gmsh(cfg.meshfile)
    space = FunctionSpace(mesh, 1)
    res = run_instationary_pnp_from_pb(cfg, space, n_steps=3)
    for f in (res.phi, res.cp, res.cm):
        assert np.isfinite(np.asarray(f)).all()
    # the 24.1 outflow bias must be held on the Dirichlet dofs
    from pnp_tpu.fem.constraints import dirichlet_dof_mask, dirichlet_dof_values
    mask = dirichlet_dof_mask(space, cfg, 0)
    vals = dirichlet_dof_values(space, cfg, 0)
    np.testing.assert_allclose(np.asarray(res.phi)[mask], vals[mask], atol=1e-12)
    assert np.asarray(res.phi).max() > 20.0  # bias present in the field


def test_pore_without_dna_synthesized_mesh(ref_test_dir):
    """pore_without_dna.msh is not shipped (only its .geo); run the config
    on the mesh synthesized from the .geo dimensions
    (meshio.structured.pore_without_dna_mesh)."""
    from pnp_tpu.meshio.structured import pore_without_dna_mesh
    cfg = read_config(str(ref_test_dir / "pore_without_dna/pore.cfg"))
    mesh = pore_without_dna_mesh(nx=50, ny=28)   # coarse for test speed
    assert mesh.edge_phys.max() < cfg.n_surfaces
    space = FunctionSpace(mesh, 1)
    res = run_instationary_pnp_from_pb(cfg, space, n_steps=2)
    assert np.isfinite(np.asarray(res.phi)).all()
    # 1 V bias held at the outflow Dirichlet dofs
    from pnp_tpu.fem.constraints import dirichlet_dof_mask, dirichlet_dof_values
    m = dirichlet_dof_mask(space, cfg, 0)
    vals = dirichlet_dof_values(space, cfg, 0)
    np.testing.assert_allclose(np.asarray(res.phi)[m], vals[m], atol=1e-12)


def test_split_vs_monolithic_steady_state(ref_test_dir):
    """Cross-validation: the operator-split driver's steady state must
    mirror the monolithic Newton solution (the monolithic operator swaps
    the species' drift signs, so cp_split <-> cm_mono; one_wall's BCs are
    symmetric under that swap)."""
    cfg = read_config(str(ref_test_dir / "one_wall_dh/one_wall.cfg"))
    mesh = read_gmsh(cfg.meshfile)
    space = FunctionSpace(mesh, 1)
    split = run_instationary_pnp_from_pb(cfg, space, n_steps=60)
    mono = run_stationary_pnp(cfg, space, from_pb=True)
    phi_m, cp_m, cm_m = map(np.asarray, split_fields(space, mono.u))
    phi_s = np.asarray(split.phi)
    cp_s, cm_s = np.asarray(split.cp), np.asarray(split.cm)
    assert np.linalg.norm(phi_s - phi_m) / np.linalg.norm(phi_m) < 2e-2
    assert np.linalg.norm(cp_s - cm_m) / np.linalg.norm(cm_m) < 2e-2
    assert np.linalg.norm(cm_s - cp_m) / np.linalg.norm(cp_m) < 2e-2

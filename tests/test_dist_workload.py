"""Distributed (owner-partitioned) production pipeline vs single-device.

The v2 multi-chip driver (workloads/distributed_pnp.py) must reproduce the
single-device production trajectory: same PB Newton solution, same DIRK
species steps + Poisson re-solves, to solver tolerance. Runs on 8 virtual
CPU devices (the mpirun-without-a-cluster substitute, SURVEY.md section 4e).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_tpu.config import read_config
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio import read_gmsh
from pnp_tpu.parallel.sharding import make_device_mesh
from pnp_tpu.workloads.distributed_pnp import build_dist_pnp_system
from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system
from pnp_tpu.workloads.pb import solve_pb

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")

ONE_WALL = "/root/reference/test/one_wall_dh/one_wall.cfg"


@pytest.fixture(scope="module")
def problem():
    cfg = read_config(ONE_WALL)
    cfg.verbosity = 0
    mesh = read_gmsh(cfg.meshfile)
    return cfg, FunctionSpace(mesh, 1)


@pytest.fixture(scope="module")
def dist_system(problem):
    cfg, space = problem
    return build_dist_pnp_system(cfg, space, make_device_mesh(8))


@needs_8
def test_distributed_pb_matches_single_device(problem, dist_system):
    cfg, space = problem
    ref = solve_pb(cfg, space)
    pb_d = dist_system.to_global(dist_system.pb)
    pb_r = np.asarray(ref.u)
    assert dist_system.pb_newton_iterations <= ref.iterations + 1
    rel = np.linalg.norm(pb_d - pb_r) / np.linalg.norm(pb_r)
    assert rel < 1e-8


@needs_8
def test_distributed_trajectory_matches(problem, dist_system):
    cfg, space = problem
    pb_g = jnp.asarray(dist_system.to_global(dist_system.pb))
    rsys = build_pnp_system(cfg, space, pb_field=pb_g)

    uphi_d, uc_d = dist_system.uphi0, dist_system.uc0
    uphi_r, ucp_r, ucm_r = rsys.uphi0, rsys.ucp0, rsys.ucm0
    np.testing.assert_allclose(dist_system.to_global(uphi_d),
                               np.asarray(uphi_r), atol=1e-12)
    for _ in range(3):
        uc_d, _ = dist_system.species_step(uphi_d, uc_d)
        uphi_d, _ = dist_system.poisson_solve(uphi_d, uc_d)
        ucp_r, ucm_r, _ = rsys.species_step(uphi_r, ucp_r, ucm_r)
        uphi_r, _ = rsys.poisson_solve(uphi_r, ucp_r, ucm_r)
    # both sides solve stages to 1e-5 relative / Poisson to 1e-10; the
    # trajectories agree far below the stage tolerance on this problem
    np.testing.assert_allclose(dist_system.to_global(uphi_d),
                               np.asarray(uphi_r), atol=1e-8)
    np.testing.assert_allclose(dist_system.to_global(uc_d[0]),
                               np.asarray(ucp_r), atol=1e-8)
    np.testing.assert_allclose(dist_system.to_global(uc_d[1]),
                               np.asarray(ucm_r), atol=1e-8)


@needs_8
def test_scan_fast_path_matches_loop(dist_system):
    uphi_l, uc_l = dist_system.uphi0, dist_system.uc0
    for _ in range(2):
        uphi_l, uc_l = dist_system.fused_step(uphi_l, uc_l)
    uphi_s, uc_s = dist_system.scan_steps((dist_system.uphi0,
                                           dist_system.uc0), 2)
    np.testing.assert_allclose(np.asarray(uphi_s), np.asarray(uphi_l),
                               rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(uc_s), np.asarray(uc_l),
                               rtol=0, atol=1e-14)

"""Bitwise determinism: identical inputs -> identical outputs.

The reference's MPI runs are nondeterministic across rank counts (reduction
order); the rebuild's XLA programs are deterministic per device topology —
the property the checkpoint/resume contract and golden tests rely on
(SURVEY.md section 5 "race detection" rebuild note).
"""

import numpy as np

from pnp_tpu.config import read_config
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio import read_gmsh
from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system


def test_step_bitwise_deterministic(ref_test_dir):
    cfg = read_config(str(ref_test_dir / "one_wall_dh/one_wall.cfg"))
    mesh = read_gmsh(cfg.meshfile)
    space = FunctionSpace(mesh, 1)
    import jax.numpy as jnp
    system = build_pnp_system(cfg, space, pb_field=jnp.zeros(space.ndof))
    a1 = system.fused_step(system.uphi0, system.ucp0, system.ucm0)
    a2 = system.fused_step(system.uphi0, system.ucp0, system.ucm0)
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_build_deterministic(ref_test_dir):
    cfg = read_config(str(ref_test_dir / "one_wall_dh/one_wall.cfg"))
    mesh = read_gmsh(cfg.meshfile)
    s1 = FunctionSpace(mesh, 2)
    s2 = FunctionSpace(mesh, 2)
    np.testing.assert_array_equal(s1.dofmap, s2.dofmap)
    np.testing.assert_array_equal(s1.dof_coords, s2.dof_coords)
    np.testing.assert_array_equal(s1.bedge_dofs, s2.bedge_dofs)

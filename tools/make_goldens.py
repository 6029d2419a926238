#!/usr/bin/env python3
"""Generate golden regression snapshots for the shipped configs.

BASELINE.md: the reference publishes no fields, so the rebuild's baseline
is *established* here — these snapshots pin the numerics so later rounds'
refactors are caught by tests/test_golden.py (rel-L2 tolerance).

Run on the CPU backend for determinism:  python tools/make_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pnp_tpu.config import read_config
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio import read_gmsh
from pnp_tpu.validation import save_golden

REF = "/root/reference/test"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")


def main():
    from pnp_tpu.workloads.pb import solve_pb
    from pnp_tpu.workloads.stationary_pnp import run_stationary_pnp, split_fields
    from pnp_tpu.workloads.stationary_diffusion import run_stationary_diffusion
    from pnp_tpu.workloads.instationary_pnp_from_pb import (
        run_instationary_pnp_from_pb)

    # one_wall_dh: PB + 10 production steps
    cfg = read_config(f"{REF}/one_wall_dh/one_wall.cfg")
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    pb = solve_pb(cfg, space)
    assert pb.converged
    save_golden(f"{OUT}/one_wall_pb.npz", phi=pb.u)
    r = run_instationary_pnp_from_pb(cfg, space, n_steps=10)
    save_golden(f"{OUT}/one_wall_pnp10.npz", phi=r.phi, cp=r.cp, cm=r.cm)
    print("one_wall done")

    # sphere_pb: PB
    cfg = read_config(f"{REF}/sphere_pb/sphere.cfg")
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    pb = solve_pb(cfg, space)
    assert pb.converged
    save_golden(f"{OUT}/sphere_pb.npz", phi=pb.u)
    print("sphere done")

    # cylinder: monolithic stationary PNP
    cfg = read_config(f"{REF}/cylinder_config.cfg")
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    res = run_stationary_pnp(cfg, space, from_pb=True)
    assert res.converged
    phi, cp, cm = split_fields(space, res.u)
    save_golden(f"{OUT}/cylinder_pnp.npz", phi=phi, cp=cp, cm=cm)
    print("cylinder done")

    # pore_pnp: 3 production steps. Two snapshots:
    #   pore_pnp3.npz       — production stage tolerance (1e-5): pins
    #                         DETERMINISM of the shipped configuration;
    #   pore_pnp3_tight.npz — stage solves at 1e-12: the trajectory
    #                         "truth" the production run must stay near
    #                         (ACCURACY pin — solver-implementation
    #                         independent). The oscillatory pore transient
    #                         amplifies stage slack ~50x over 3 steps, so
    #                         the production run sits ~5e-4 from truth.
    cfg = read_config(f"{REF}/pore_pnp/pore.cfg")
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    r = run_instationary_pnp_from_pb(cfg, space, n_steps=3)
    save_golden(f"{OUT}/pore_pnp3.npz", phi=r.phi, cp=r.cp, cm=r.cm)
    rt = run_instationary_pnp_from_pb(cfg, space, n_steps=3,
                                      stage_reduction=1e-12)
    save_golden(f"{OUT}/pore_pnp3_tight.npz", phi=rt.phi, cp=rt.cp, cm=rt.cm)
    from pnp_tpu.validation import relative_l2
    slack = {k: float(relative_l2(space, getattr(r, k), getattr(rt, k)))
             for k in ("phi", "cp", "cm")}
    print("pore done; production-vs-tight slack:", slack)

    # coarse pore: stationary diffusion on the pore_without_dna config
    cfg = read_config(f"{REF}/pore_without_dna/pore.cfg")
    mesh = read_gmsh(f"{REF}/pore.msh")
    if mesh.edge_phys.max() < cfg.n_surfaces:
        space = FunctionSpace(mesh, 1)
        u, _ = run_stationary_diffusion(cfg, space)
        save_golden(f"{OUT}/pore_coarse_diffusion.npz", u=u)
        print("pore coarse done")


if __name__ == "__main__":
    main()

"""Command-line launcher.

Parity: reference ``bin/dune_pnp.py`` (:1-43): selects the linear-solver
variant (-s), polynomial degree (-p) and parallel width (-n), then runs a
config. There the choice picked a pre-compiled binary
(``dune_pnp_<SOLVER>_<P>``) and an ``mpirun -np N`` launch; here the same
flags are runtime config (JIT specializes) and -n selects how many local
devices the element tables shard over.

Extra flags expose the rebuild's additional capability surface
(workload selection, output dir, checkpointing, profiling).
"""

from __future__ import annotations

import argparse
import sys
import time

from .config import read_config, LINEAR_SOLVERS

WORKLOADS = (
    "instationary_pnp_from_pb",   # the shipped binary's driver
    "stationary_pnp",
    "stationary_pnp_from_pb",
    "instationary_pnp",
    "stationary_diffusion",
    "pb",
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pnp_tpu",
        description="TPU-native PNP electrokinetics solver (dune-pnp capability surface)")
    p.add_argument("config", help="INI config file (reference .cfg format)")
    p.add_argument("-s", "--solver", choices=LINEAR_SOLVERS, default=None,
                   help="linear solver variant (default: config/BCGS_SSORk)")
    p.add_argument("-p", "--degree", type=int, choices=(1, 2, 3), default=None,
                   help="polynomial degree (default: config/1)")
    p.add_argument("-n", "--num-devices", type=int, default=1,
                   help="devices to shard mesh elements over")
    p.add_argument("-w", "--workload", choices=WORKLOADS,
                   default="instationary_pnp_from_pb")
    p.add_argument("-o", "--output-dir", default=None)
    p.add_argument("--steps", type=int, default=None,
                   help="override nSteps from the config")
    p.add_argument("--checkpoint", default=None, help="checkpoint file path")
    p.add_argument("--checkpoint-freq", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax profiler trace here")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    sys_cfg = read_config(args.config)
    if args.solver:
        sys_cfg.linearSolver = args.solver
    if args.degree:
        sys_cfg.degree = args.degree

    from .fem.space import FunctionSpace
    from .meshio import read_gmsh

    mesh = read_gmsh(sys_cfg.meshfile)
    space = FunctionSpace(mesh, sys_cfg.degree)
    print(f"[pnp_tpu] mesh {sys_cfg.meshfile}: {mesh.num_nodes} nodes, "
          f"{mesh.num_tris} triangles, {mesh.num_boundary_edges} boundary edges; "
          f"P{sys_cfg.degree} -> {space.ndof} dofs/field")

    device_mesh = None
    if args.num_devices > 1:
        from .parallel.sharding import make_device_mesh
        device_mesh = make_device_mesh(args.num_devices)

    profiler = None
    if args.profile_dir:
        import jax
        jax.profiler.start_trace(args.profile_dir)
        profiler = True

    t0 = time.perf_counter()
    if args.workload == "pb":
        from .workloads.pb import solve_pb
        res = solve_pb(sys_cfg, space)
        print(f"[pnp_tpu] PB Newton: {res.iterations} its, defect "
              f"{res.defect:.3e} (reduction {res.defect / res.initial_defect:.3e})")
    elif args.workload == "stationary_diffusion":
        from .workloads.stationary_diffusion import run_stationary_diffusion
        u, res = run_stationary_diffusion(sys_cfg, space,
                                          output_dir=args.output_dir)
        print(f"[pnp_tpu] linear solve: {int(res.iterations)} its, "
              f"relres {float(res.relres):.3e}")
    elif args.workload in ("stationary_pnp", "stationary_pnp_from_pb"):
        from .workloads.stationary_pnp import run_stationary_pnp
        res = run_stationary_pnp(sys_cfg, space,
                                 from_pb=args.workload.endswith("from_pb"))
        print(f"[pnp_tpu] PNP Newton: {res.iterations} its, converged="
              f"{res.converged}")
    elif args.workload == "instationary_pnp":
        from .workloads.instationary_pnp import run_instationary_pnp
        res = run_instationary_pnp(sys_cfg, space, n_steps=args.steps)
        print(f"[pnp_tpu] explicit run: {res.steps} steps, dt={res.dt:.3e}, "
              f"t={res.time:.3e}")
    elif device_mesh is not None:
        # -n > 1: the v2 owner-partitioned production driver (dof vectors
        # sharded by owner, packed halo exchange, distributed Schwarz)
        from .workloads.distributed_pnp import run_distributed_pnp_from_pb
        res = run_distributed_pnp_from_pb(
            sys_cfg, space, device_mesh, n_steps=args.steps,
            output_dir=args.output_dir, checkpoint_path=args.checkpoint,
            checkpoint_freq=args.checkpoint_freq, resume=args.resume)
        dofs = 3 * space.ndof * res.steps
        dt = time.perf_counter() - t0
        print(f"[pnp_tpu] {res.steps} steps on {res.n_devices} devices in "
              f"{dt:.2f}s ({dofs / dt:,.0f} assembled-solved DOFs/s)")
    else:
        from .workloads.instationary_pnp_from_pb import run_instationary_pnp_from_pb
        res = run_instationary_pnp_from_pb(
            sys_cfg, space, n_steps=args.steps, output_dir=args.output_dir,
            checkpoint_path=args.checkpoint,
            checkpoint_freq=args.checkpoint_freq, resume=args.resume)
        dofs = 3 * space.ndof * res.steps
        dt = time.perf_counter() - t0
        print(f"[pnp_tpu] {res.steps} steps in {dt:.2f}s "
              f"({dofs / dt:,.0f} assembled-solved DOFs/s)")
    if profiler:
        import jax
        jax.profiler.stop_trace()
    print(f"[pnp_tpu] total wall {time.perf_counter() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

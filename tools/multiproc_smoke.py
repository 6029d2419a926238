"""Multi-process jax.distributed bring-up smoke (localhost CPU).

VERDICT r1 item 8: prove ``parallel/distributed.py`` composes with the v2
owner-partitioned pipeline at the PROCESS level — the reference's
``mpirun -np N`` analogue (src/dune_pnp.cc:13) — without TPU hardware.
Launched with no args it spawns N worker copies of itself; each worker
initializes jax.distributed against a localhost coordinator, forces the
CPU backend with 2 local devices, builds the global 2N-device mesh, and
runs one distributed production step on one_wall. The coordinator rank
checks the result against the single-process trajectory.

Usage:
    python tools/multiproc_smoke.py            # launcher (2 procs)
    python tools/multiproc_smoke.py --procs 4

Also exercised opt-in by tests/test_multiprocess.py (marked slow).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ONE_WALL = "/root/reference/test/one_wall_dh/one_wall.cfg"
LOCAL_DEVICES = 2


def worker(num_processes: int, process_id: int, port: int) -> None:
    # force CPU with a fixed local device count BEFORE first jax use; the
    # container pre-imports jax with a TPU backend, so flags must go
    # through jax.config (env vars are too late — see CLAUDE.md)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, REPO)
    from pnp_tpu.parallel.distributed import (
        global_device_mesh, initialize_distributed, is_coordinator)

    started = initialize_distributed(f"localhost:{port}", num_processes,
                                     process_id)
    assert started, "initialize_distributed returned False"
    assert jax.process_count() == num_processes
    mesh = global_device_mesh()
    n_global = int(mesh.devices.size)
    assert n_global == num_processes * LOCAL_DEVICES, n_global

    import numpy as np
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.distributed_pnp import build_dist_pnp_system

    cfg = read_config(ONE_WALL)
    cfg.verbosity = 0
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)   # every rank parses
    system = build_dist_pnp_system(cfg, space, mesh)    # incl. PB Newton
    uphi, uc = system.fused_step(system.uphi0, system.uc0)

    # cross-process gather of the owner-partitioned state
    phi_g = system.to_global(uphi)
    assert np.isfinite(phi_g).all()
    # single-process reference trajectory (deterministic; every rank can
    # compute it — no broadcast needed)
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system
    rsys = build_pnp_system(cfg, space)
    s = rsys.fused_step(rsys.uphi0, rsys.ucp0, rsys.ucm0)
    err = float(np.max(np.abs(phi_g - np.asarray(s[0]))))
    assert err < 1e-7, f"multi-process trajectory off by {err}"
    if is_coordinator():
        print(f"MULTIPROC-OK procs={num_processes} devices={n_global} "
              f"pb_newton={system.pb_newton_iterations} err={err:.2e}",
              flush=True)
    jax.distributed.shutdown()


def launcher(num_processes: int, port: int) -> int:
    procs = []
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--procs", str(num_processes), "--id", str(pid),
             "--port", str(port)],
            stdout=None if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if pid == 0 else subprocess.DEVNULL))
    rc = 0
    for p in procs:
        rc |= p.wait(timeout=600)
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--id", type=int, default=0)
    ap.add_argument("--port", type=int, default=29517)
    args = ap.parse_args()
    if args.worker:
        worker(args.procs, args.id, args.port)
        return 0
    return launcher(args.procs, args.port)


if __name__ == "__main__":
    raise SystemExit(main())

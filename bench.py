"""Benchmark: production PNP time steps on the flagship pore_pnp problem.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: assembled-and-solved DOFs/s on one chip for the full production
pipeline step (species drift-diffusion reassembly + two Alexander2 DIRK
stage solves per species + decoupled Poisson SLP re-solve at 1e-10), i.e.
3 * ndof dofs advanced per step. The reference publishes no numbers
(BASELINE.md) so vs_baseline is measured against the previous round's
recorded value in BENCH_BASELINE.json when present, else 1.0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    mesh = read_gmsh(cfg.meshfile)
    space = FunctionSpace(mesh, 1)
    system = build_pnp_system(cfg, space, pb_field=jnp.zeros(space.ndof))

    state = (system.uphi0, system.ucp0, system.ucm0)
    n_warm, n_meas = 3, 20

    # warmup/compile
    state = system.scan_steps(state, n_warm)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    state = system.scan_steps(state, n_meas)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    dofs_per_step = 3 * space.ndof
    value = dofs_per_step * n_meas / elapsed

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        try:
            base = json.load(open(baseline_path))["value"]
            if base > 0:
                vs = value / base
        except Exception:
            pass

    print(json.dumps({
        "metric": "pore_pnp_production_step_dofs_per_s_per_chip",
        "value": round(value, 2),
        "unit": "DOF/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()

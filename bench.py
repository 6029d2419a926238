"""Benchmark: production PNP time steps on the flagship pore_pnp problem.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: assembled-and-solved DOFs/s on one chip for the full production
pipeline step (drift-diffusion reassembly + batched two-species Alexander2
DIRK stage solves at 1e-5 + decoupled Poisson SLP re-solve at 1e-10), i.e.
3 * ndof field dofs advanced per step, after a real PB Newton bootstrap.
The reference publishes no numbers (BASELINE.md), so vs_baseline compares
against the previous round's value recorded in BENCH_BASELINE.json when
present, else 1.0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run(n_meas: int = 10):
    import jax
    import jax.numpy as jnp
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    # keep single-program device time bounded (watchdog safety); the
    # equilibrium-bootstrapped solves converge in O(100) iterations
    cfg.linearSolverIterations = min(cfg.linearSolverIterations, 3000)
    mesh = read_gmsh(cfg.meshfile)
    space = FunctionSpace(mesh, 1)
    system = build_pnp_system(cfg, space)   # includes the PB Newton solve

    uphi, ucp, ucm = system.uphi0, system.ucp0, system.ucm0

    def step(uphi, ucp, ucm):
        # the production step (potentialUpdateFreq=1 in pore.cfg): fresh
        # stage factorization + species DIRK stages + exact Poisson re-solve
        # as ONE program — what the driver time loop runs
        return system.fused_step(uphi, ucp, ucm)

    # warmup/compile
    for _ in range(2):
        uphi, ucp, ucm = step(uphi, ucp, ucm)
    jax.block_until_ready(uphi)

    t0 = time.perf_counter()
    for _ in range(n_meas):
        uphi, ucp, ucm = step(uphi, ucp, ucm)
    jax.block_until_ready(uphi)
    elapsed = time.perf_counter() - t0
    assert bool(jnp.isfinite(uphi).all()), "non-finite state"
    return 3 * space.ndof * n_meas / elapsed


def main():
    value = None
    for attempt in range(2):
        try:
            value = run()
            break
        except Exception as e:
            sys.stderr.write(f"bench attempt {attempt} failed: {e}\n")
            time.sleep(5)
    if value is None:
        print(json.dumps({"metric": "pore_pnp_production_step_dofs_per_s_per_chip",
                          "value": 0.0, "unit": "DOF/s", "vs_baseline": 0.0}))
        return

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

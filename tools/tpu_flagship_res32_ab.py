"""Flagship A/B + 120-step gate for stage_residual_f32.

The dense-path stage refinement computes residuals through the
f64-EMULATED element SpMV; at stage tolerance 1e-5 a true-f32 (HIGHEST)
residual is two decades more accurate than needed. This measures the
fused-step win and runs the 120-step finiteness gate (the same bar the
Pallas-inverse default had to pass, tools/tpu_pallas_e2e.py pattern)
BEFORE the switch may default on TPU (CLAUDE.md rule).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system
    from pnp_tpu.workloads.pb import solve_pb

    assert jax.default_backend() == "tpu"
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    pb = solve_pb(cfg, space).u
    variants = {}
    for name, flag in (("f64-residual (shipping)", False),
                       ("f32-residual", True)):
        system = build_pnp_system(cfg, space, pb_field=pb,
                                  stage_residual_f32=flag)
        state = (system.uphi0, system.ucp0, system.ucm0)
        for _ in range(2):
            state = system.fused_step(*state)
        jax.block_until_ready(state[0])
        t0 = time.perf_counter()
        for _ in range(10):
            state = system.fused_step(*state)
        jax.block_until_ready(state[0])
        ms = (time.perf_counter() - t0) / 10 * 1e3
        # refinement-count check (stage solver economics must not degrade)
        ucp, ucm, its = system.species_step(state[0], state[1], state[2])
        jax.block_until_ready(ucp)
        print(f"  [{name}] fused_step {ms:.2f} ms | species refinement "
              f"its {int(its)}", flush=True)
        variants[flag] = (system, ms)

    # 120-step finiteness gate with the f32-residual variant
    system, _ = variants[True]
    state = (system.uphi0, system.ucp0, system.ucm0)
    t0 = time.perf_counter()
    for i in range(120):
        state = system.fused_step(*state)
        if (i + 1) % 24 == 0:
            fin = bool(jnp.isfinite(state[0]).all()
                       & jnp.isfinite(state[1]).all()
                       & jnp.isfinite(state[2]).all())
            print(f"  gate step {i + 1}: finite={fin}", flush=True)
            if not fin:
                raise FloatingPointError(f"non-finite at step {i + 1}")
    print(f"  gate: 120 steps in {time.perf_counter() - t0:.1f} s",
          flush=True)

    # trajectory deviation vs the f64-residual path over 12 steps (must
    # stay within the documented stage-solve slack)
    sys_a, _ = variants[False]
    sa = (sys_a.uphi0, sys_a.ucp0, sys_a.ucm0)
    sb = (system.uphi0, system.ucp0, system.ucm0)
    for _ in range(12):
        sa = sys_a.fused_step(*sa)
        sb = system.fused_step(*sb)
    dev = max(float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1.0))
              for a, b in zip(sa, sb))
    print(f"  12-step trajectory deviation vs f64 path: {dev:.2e} "
          "(stage-slack budget ~1e-3)", flush=True)
    assert dev < 2.5e-3, dev
    print("RES32-AB-OK", flush=True)


if __name__ == "__main__":
    main()

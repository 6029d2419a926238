"""Flagship program-structure A/B: python-loop fused_step vs lax.scan.

VERDICT r4 item 7: the flagship has been flat ~50 ms/step for three
rounds and every NUMERIC lever is declined with hardware numbers
(tools/results_tpu_inverse_study_r4.log, results_tpu_res32_ab_r4.log).
The untried lever is program structure: species+poisson barely overlap
(44.4 + 8.1 ~ 52.5 vs 51.3 fused), and the transient is thousands of
identical steps — one whole-block ``lax.scan`` removes per-step program
launches and lets XLA overlap across the step boundary.

Measures, on the production flagship state (real PB bootstrap):
  * 20 steps as 20 fused_step launches (the shipping bench protocol);
  * 20 steps as scan_steps(state, 20) (one program);
  * 20 steps as 4 x scan_steps(state, 5) (compile-size compromise);
and checks trajectory parity between loop and scan (same math, same
programs inside — must agree to fp reassociation slack).

Reference bar: the species SLP solves,
/root/reference/src/instationary_pnp_from_pb_md.hh:383-386.
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

    assert jax.default_backend() == "tpu"
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    print(f"ndof={space.ndof}", flush=True)
    t0 = time.perf_counter()
    system = build_pnp_system(cfg, space)
    print(f"build: {time.perf_counter() - t0:.1f} s", flush=True)

    # presolved protocol (CLAUDE.md r4): A/Bing two different programs on
    # the raw biased state diverges chaotically; presolved tracks 1e-12
    uphi, _ = system.poisson_solve(system.uphi0, system.ucp0, system.ucm0)
    state0 = (uphi, system.ucp0, system.ucm0)

    N = 20

    def loop_run(state):
        for _ in range(N):
            state = system.fused_step(*state)
        return state

    # warm every program
    s_loop = loop_run(state0)
    jax.block_until_ready(s_loop[0])
    s_scan = system.scan_steps(state0, N)
    jax.block_until_ready(s_scan[0])
    s_chunk = state0
    for _ in range(4):
        s_chunk = system.scan_steps(s_chunk, 5)
    jax.block_until_ready(s_chunk[0])

    # parity (warm runs above, same start state)
    for name, a, b in (("phi", s_loop[0], s_scan[0]),
                       ("cp", s_loop[1], s_scan[1]),
                       ("cm", s_loop[2], s_scan[2])):
        d = float(jnp.max(jnp.abs(a - b)))
        sc = float(jnp.max(jnp.abs(a))) + 1.0
        print(f"  parity loop-vs-scan {name}: max|d|/scale = {d / sc:.2e}",
              flush=True)

    def timeit(fn, label):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out[0])
        ms = (time.perf_counter() - t0) * 1e3
        fin = bool(jnp.isfinite(out[0]).all())
        print(f"  [{label}] {ms / N:.1f} ms/step ({ms:.0f} ms / {N} steps) "
              f"finite={fin}", flush=True)
        return ms

    for rep in range(3):
        timeit(lambda: loop_run(state0), f"rep{rep} loop x{N}")
        timeit(lambda: system.scan_steps(state0, N), f"rep{rep} scan({N})")

        def chunk():
            s = state0
            for _ in range(4):
                s = system.scan_steps(s, 5)
            return s
        timeit(chunk, f"rep{rep} 4 x scan(5)")
    print("FLAGSHIP-SCAN-AB-OK", flush=True)


if __name__ == "__main__":
    main()

"""TPU probe: is dense-INVERSE reuse with a refresh cadence a win on the
flagship step?

r1 measured LU-reuse 10x slower than fresh factorization (triangular-solve
applies + host syncs). The explicit-inverse path has different economics:
a stale inverse only raises refinement-matvec counts (~2.5 ms each), while
a fresh inversion costs ~26 ms per step. This probe times, on the real
pore transient after a warm-up of 20 steps:
  a) fused_step              (fresh inverse every step)
  b) species_factor every R steps + fused_step_reuse between
for R in (2, 4, 8), printing ms/step and refinement counts.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    print("backend:", jax.default_backend(), flush=True)
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    t0 = time.perf_counter()
    system = build_pnp_system(cfg, space)
    state = (system.uphi0, system.ucp0, system.ucm0)
    for _ in range(20):                       # into the advective regime
        state = system.fused_step(*state)
    jax.block_until_ready(state[0])
    print(f"build+warmup(20): {time.perf_counter()-t0:.1f} s", flush=True)

    n = 16
    st = state
    t0 = time.perf_counter()
    for _ in range(n):
        st = system.fused_step(*st)
    jax.block_until_ready(st[0])
    fresh_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"fresh inverse: {fresh_ms:.1f} ms/step", flush=True)

    # dispatch-overhead check: the same 16 steps as ONE lax.scan program
    # (production-legal between output cadences; outputFreq=10)
    st = state
    _ = system.scan_steps(st, 16)               # compile
    jax.block_until_ready(_[0])
    t0 = time.perf_counter()
    st = system.scan_steps(st, 16)
    jax.block_until_ready(st[0])
    scan_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"scan_steps(16): {scan_ms:.1f} ms/step "
          f"(dispatch overhead {fresh_ms - scan_ms:+.1f} ms/step)", flush=True)

    for R in (2, 4, 8):
        st = state
        factor = system.species_factor(st[0])
        _ = system.fused_step_reuse(factor, *st)   # compile
        jax.block_until_ready(_[0])
        t0 = time.perf_counter()
        for i in range(n):
            if i % R == 0:
                factor = system.species_factor(st[0])
            st = system.fused_step_reuse(factor, *st)
        jax.block_until_ready(st[0])
        ms = (time.perf_counter() - t0) / n * 1e3
        _, _, its = system.species_step_reuse(factor, *st)
        ok = bool(jnp.isfinite(st[0]).all())
        print(f"reuse R={R}: {ms:.1f} ms/step (refinements/step ~{int(its)},"
              f" finite={ok})", flush=True)
    print("REUSE-PROBE-DONE", flush=True)


if __name__ == "__main__":
    main()

"""TPU e2e gate for defaulting the Pallas GJ inverse ON in production.

Runs the pore production transient TWICE in one process — XLA inverse vs
Pallas pivoted-GJ inverse (PNP_TPU_PALLAS_INV toggled between builds; the
flag is read at trace time) — for long enough to reach the late-transient
advective regime that broke the r2 no-pivot kernel, checking finiteness
along the way and comparing the trajectories at the end. Also times both
step programs (dependency-chained).

Passes = prints PALLAS-E2E-OK. This is the evidence required by the
CLAUDE.md rule: TPU-only behavior switches need a TPU e2e run BEFORE
committing as default.
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N_STEPS = 120
BLOCK = 10


def build_and_run(label):
    import jax
    import jax.numpy as jnp
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    t0 = time.perf_counter()
    system = build_pnp_system(cfg, space)
    state = (system.uphi0, system.ucp0, system.ucm0)
    state = system.fused_step(*state)          # compile + step 1
    jax.block_until_ready(state[0])
    print(f"[{label}] build+compile+step1: {time.perf_counter()-t0:.1f} s",
          flush=True)
    for blk in range(1, N_STEPS // BLOCK):
        for _ in range(BLOCK):
            state = system.fused_step(*state)
        jax.block_until_ready(state[0])
        finite = bool(jnp.isfinite(state[0]).all()
                      & jnp.isfinite(state[1]).all()
                      & jnp.isfinite(state[2]).all())
        print(f"[{label}] step {(blk + 1) * BLOCK - (BLOCK - 1)}.."
              f"{blk * BLOCK + 1}: finite={finite}", flush=True)
        if not finite:
            raise FloatingPointError(f"{label}: non-finite")
    # chained timing of the production step
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state = system.fused_step(*state)
    jax.block_until_ready(state[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"[{label}] fused_step: {ms:.1f} ms", flush=True)
    return state, ms


def main():
    import jax
    import numpy as np
    print("backend:", jax.default_backend(), flush=True)
    assert jax.default_backend() == "tpu", "this gate needs the TPU"

    os.environ["PNP_TPU_PALLAS_INV"] = "0"
    state_xla, ms_xla = build_and_run("xla-inv")
    os.environ["PNP_TPU_PALLAS_INV"] = "1"
    state_gj, ms_gj = build_and_run("pallas-inv")

    # trajectory agreement: stage solves are 1e-5-exact in both, so the
    # difference is trajectory slack only (the pore transient is
    # chaotic-adjacent; CLAUDE.md two-sided-golden discussion). Bound it
    # loosely — the real acceptance is finiteness + per-step sanity.
    for name, a, b in (("phi", state_xla[0], state_gj[0]),
                       ("cp", state_xla[1], state_gj[1]),
                       ("cm", state_xla[2], state_gj[2])):
        d = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        s = float(np.max(np.abs(np.asarray(a))))
        print(f"traj diff {name}: max|d|={d:.3e} (scale {s:.3e})", flush=True)
        assert d < 0.05 * max(s, 1.0), f"{name} trajectories diverged: {d}"
    print(f"speed: xla {ms_xla:.1f} ms vs pallas {ms_gj:.1f} ms "
          f"({ms_xla / ms_gj:.2f}x)", flush=True)
    print("PALLAS-E2E-OK", flush=True)


if __name__ == "__main__":
    main()

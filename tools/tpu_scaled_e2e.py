"""TPU e2e gate + profile for the large-mesh (block-RAS) path.

Evidence runs required by VERDICT r2 items 1-2 and the CLAUDE.md rule
(TPU-only behavior switches need a TPU e2e run BEFORE committing as
default):

  * LEVEL 1 (11,839 nodes): the mid-size constant-Poisson f32-inverse
    tier — r2's lax.cond form failed to COMPILE here (vmem OOM in the
    XLA-LU fallback branch); the r3 host-dispatched setup
    (solvers/direct.py:inv_f32_setup) must build, run steps finitely,
    and beat r1's ~2.8 s/step.
  * LEVEL 2 (46,653 nodes): per-phase timing breakdown of the 7.8 s/step
    VERDICT r2 called unprofiled — species factor build, species stage
    solves (+iteration counts), Poisson re-solve (+iterations), fused
    step — so the optimization work has a target.

One process, both levels (first TPU compile ~74 s is paid once). Output
is line-buffered; run via run_in_background with a >=25 min timeout
(remote-compile latency is wildly variable, CLAUDE.md r2 lessons).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def build(levels):
    import jax
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    mesh = read_gmsh(cfg.meshfile)
    if levels:
        mesh = refine_uniform(mesh, levels)
    space = FunctionSpace(mesh, 1)
    print(f"[L{levels}] ndof={space.ndof}", flush=True)
    t0 = time.perf_counter()
    system = build_pnp_system(cfg, space)
    print(f"[L{levels}] build (incl. PB Newton): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)
    return cfg, space, system


def timeit(label, fn, n=4):
    import jax
    out = fn()                      # warmup/compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"  {label}: {ms:.1f} ms", flush=True)
    return out, ms


def profile_level(levels, n_steps=6):
    import jax
    import jax.numpy as jnp
    cfg, space, system = build(levels)
    uphi, ucp, ucm = system.uphi0, system.ucp0, system.ucm0
    (uphi, _), _ = timeit("poisson_solve (cold state)",
                          lambda: system.poisson_solve(uphi, ucp, ucm), 2)

    t0 = time.perf_counter()
    factor = system.species_factor(uphi)
    jax.block_until_ready(factor)
    print(f"  species_factor compile+run: {time.perf_counter() - t0:.1f} s",
          flush=True)
    factor, _ = timeit("species_factor",
                       lambda: system.species_factor(uphi), 2)
    # stepped profile: advance the transient, recording per-phase costs
    for i in range(n_steps):
        t0 = time.perf_counter()
        if i % 4 == 0:
            factor = system.species_factor(uphi)
            jax.block_until_ready(factor)
        t1 = time.perf_counter()
        ucp2, ucm2, sp_it = system.species_step_reuse(factor, uphi, ucp, ucm)
        jax.block_until_ready(ucp2)
        t2 = time.perf_counter()
        uphi2, po_it = system.poisson_solve(uphi, ucp2, ucm2)
        jax.block_until_ready(uphi2)
        t3 = time.perf_counter()
        uphi, ucp, ucm = uphi2, ucp2, ucm2
        print(f"  step {i}: factor {1e3 * (t1 - t0):.0f} ms | species "
              f"{1e3 * (t2 - t1):.0f} ms ({int(sp_it)} its) | poisson "
              f"{1e3 * (t3 - t2):.0f} ms ({int(po_it)} its)", flush=True)
        finite = bool(jnp.isfinite(uphi).all() & jnp.isfinite(ucp).all()
                      & jnp.isfinite(ucm).all())
        if not finite:
            raise FloatingPointError(f"L{levels} step {i}: non-finite")
    # fused step (production program) timing, dependency-chained
    state = (uphi, ucp, ucm)

    def fused():
        nonlocal state
        state = system.fused_step_reuse(factor, *state)
        return state

    _, fused_ms = timeit("fused_step_reuse", fused, 4)
    return fused_ms, (cfg, space, system, state)


AB_VARIANTS = {
    "baseline": dict(mixed_precision=False),
    "mixed": dict(mixed_precision=True),
    # species_two_level variants removed from the default sweep: both
    # FAULTED THE DEVICE at 46k (UNAVAILABLE: TPU device error, r3 log)
    # and the option showed no iteration win at smaller sizes — the
    # batched p1-coarse path stays opt-in pending a Mosaic-level
    # diagnosis; run `--ab two_level` explicitly to reproduce.
    "two_level": dict(species_two_level=True, mixed_precision=False),
}
AB_DEFAULT = ("baseline", "mixed")
AB_STATE = "/tmp/pnp_tpu_ab_state.npz"


def run_ab_variant(name: str, levels: int = 2):
    """One A/B variant per PROCESS (VERDICT r2 item 2 evidence): a crashed
    or watchdog-killed variant must not take down the others. Loads the
    PB field + advanced state saved by the profile run (AB_STATE)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    mesh = read_gmsh(cfg.meshfile)
    if levels:
        mesh = refine_uniform(mesh, levels)
    space = FunctionSpace(mesh, 1)
    ck = np.load(AB_STATE)
    uphi, ucp, ucm = (jnp.asarray(ck[k]) for k in ("uphi", "ucp", "ucm"))
    # poisson_inv_threshold=0: the species A/B must not build another
    # 8.7 GB Poisson inverse per variant (HBM)
    sysv = build_pnp_system(cfg, space, pb_field=jnp.asarray(ck["pb"]),
                            poisson_inv_threshold=0, **AB_VARIANTS[name])
    f = sysv.species_factor(uphi)
    jax.block_until_ready(f)
    t0 = time.perf_counter()
    f = sysv.species_factor(uphi)
    jax.block_until_ready(f)
    fa_ms = (time.perf_counter() - t0) * 1e3
    cp2, cm2, it = sysv.species_step_reuse(f, uphi, ucp, ucm)
    jax.block_until_ready(cp2)
    t0 = time.perf_counter()
    cp2, cm2, it = sysv.species_step_reuse(f, uphi, cp2, cm2)
    jax.block_until_ready(cp2)
    sp_ms = (time.perf_counter() - t0) * 1e3
    up2, po_it = sysv.poisson_solve(uphi, cp2, cm2)
    jax.block_until_ready(up2)
    t0 = time.perf_counter()
    up2, po_it = sysv.poisson_solve(up2, cp2, cm2)
    jax.block_until_ready(up2)
    po_ms = (time.perf_counter() - t0) * 1e3
    print(f"  species A/B [{name}]: factor {fa_ms:.0f} ms, "
          f"step {sp_ms:.0f} ms ({int(it)} its), poisson(ras) "
          f"{po_ms:.0f} ms ({int(po_it)} its)", flush=True)


def run_level(level: int):
    import jax
    print("backend:", jax.default_backend(), flush=True)
    assert jax.default_backend() == "tpu", "this gate needs the TPU"
    ms, ctx = profile_level(level)
    if level == 1:
        print(f"L1 RESULT: fused_step {ms:.0f} ms "
              f"({'OK' if ms < 2800 else 'SLOWER THAN R1'} vs r1 ~2800 ms)",
              flush=True)
    else:
        print(f"L{level} RESULT: fused_step {ms:.0f} ms (r2: 7823 ms)",
              flush=True)
        import numpy as np
        cfg, space, system, state = ctx
        np.savez(AB_STATE, pb=np.asarray(system.pb),
                 uphi=np.asarray(state[0]), ucp=np.asarray(state[1]),
                 ucm=np.asarray(state[2]))


def main():
    # one PROCESS per level: a 16 GB chip cannot hold level 2's 8.7 GB
    # Poisson inverse next to level 1's leftover buffers (observed
    # RESOURCE_EXHAUSTED when both levels shared a process); the extra
    # first-compile cost per process is ~74 s
    import argparse
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=None)
    ap.add_argument("--ab", type=str, default=None)
    ap.add_argument("--skip-l1", action="store_true")
    args = ap.parse_args()
    if args.ab is not None:
        run_ab_variant(args.ab)
        return
    if args.level is not None:
        run_level(args.level)
        return
    rc = 0
    for lvl in ((2,) if args.skip_l1 else (1, 2)):
        r = subprocess.run([sys.executable, "-u", __file__,
                            "--level", str(lvl)])
        rc |= r.returncode
    for name in AB_DEFAULT:
        r = subprocess.run([sys.executable, "-u", __file__, "--ab", name])
        rc |= r.returncode
    print("SCALED-E2E-OK" if rc == 0 else "SCALED-E2E-FAIL", flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()

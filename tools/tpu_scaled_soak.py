"""Large-mesh soak test on hardware (VERDICT r3 item 4).

Six steps was the whole hardware evidence for the large-mesh defaults
(mixed-precision f32 operators + ras_refresh_every=4 + the very-large
Poisson inverse); the pore transient goes violently advective late —
exactly where the flagship Pallas GJ went non-finite at step 11 and
where stale RAS factors are most stressed. This soaks:

  * LEVEL 1 (11,839 nodes): 120+ production steps;
  * LEVEL 2 (46,653 nodes): 50+ production steps;

with the SHIPPING defaults (factor amortization cadence, mixed
precision, inverse tiers), asserting per-window finiteness and recording
per-step iteration counts so drift of the stale-factor economics deep
into the transient is visible. One level per PROCESS (subprocess
isolation: a watchdog kill or device fault must not take down the other
level). Reference bar: pore.cfg runs 10,000 steps
(/root/reference/test/pore_pnp/pore.cfg:16).

Run via run_in_background with a >=40 min timeout.
"""

import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

LEVELS = {1: 120, 2: 50, 3: 20}


def soak(level: int, n_steps: int):
    import jax
    import jax.numpy as jnp
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    assert jax.default_backend() == "tpu", "soak needs the TPU"
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    mesh = read_gmsh(cfg.meshfile)
    mesh = refine_uniform(mesh, level)
    space = FunctionSpace(mesh, 1)
    print(f"[L{level}] ndof={space.ndof} steps={n_steps}", flush=True)
    t0 = time.perf_counter()
    system = build_pnp_system(cfg, space)
    print(f"[L{level}] build: {time.perf_counter() - t0:.1f} s", flush=True)

    uphi, ucp, ucm = system.uphi0, system.ucp0, system.ucm0
    uphi, _ = system.poisson_solve(uphi, ucp, ucm)   # presolve (tamed start)
    factor = None
    refresh = 4                                      # shipping default
    t_start = time.perf_counter()
    sp_hist = []
    for i in range(n_steps):
        t0 = time.perf_counter()
        if factor is None or i % refresh == 0:
            factor = system.species_factor(uphi)
        ucp, ucm, sp_it = system.species_step_reuse(factor, uphi, ucp, ucm)
        uphi, po_it = system.poisson_solve(uphi, ucp, ucm)
        jax.block_until_ready(uphi)
        sp_hist.append(int(sp_it))
        if i % 8 == 0 or i == n_steps - 1:
            fin = bool(jnp.isfinite(uphi).all() & jnp.isfinite(ucp).all()
                       & jnp.isfinite(ucm).all())
            print(f"  step {i:3d}: {1e3 * (time.perf_counter() - t0):6.0f} ms"
                  f" | species its {int(sp_it):3d} | poisson its "
                  f"{int(po_it):2d} | finite={fin}", flush=True)
            if not fin:
                raise FloatingPointError(f"L{level} non-finite at step {i}")
        if min(ucp.min(), ucm.min()) != min(ucp.min(), ucm.min()):  # NaN
            raise FloatingPointError(f"L{level} NaN at step {i}")
    wall = time.perf_counter() - t_start
    # iteration-count stability: the late-transient average must not blow
    # up vs the early average (stale factors degrade gracefully or the
    # refresh cadence is wrong)
    early = sum(sp_hist[:16]) / 16
    late = sum(sp_hist[-16:]) / 16
    print(f"[L{level}] {n_steps} steps in {wall:.0f} s "
          f"({1e3 * wall / n_steps:.0f} ms/step); species its "
          f"early-avg {early:.1f} late-avg {late:.1f}", flush=True)
    assert late < 4 * early + 20, "iteration-count blow-up late in transient"
    print(f"L{level}-SOAK-OK", flush=True)


def main():
    if len(sys.argv) > 1:
        lvl = int(sys.argv[1])
        soak(lvl, LEVELS[lvl] if len(sys.argv) < 3 else int(sys.argv[2]))
        return
    rc = 0
    for lvl in (1, 2):
        r = subprocess.run([sys.executable, "-u", __file__, str(lvl)])
        rc |= r.returncode
    print("SCALED-SOAK-OK" if rc == 0 else "SCALED-SOAK-FAIL", flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()

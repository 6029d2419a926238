"""Benchmark: production PNP time steps, flagship + scaled pore family.

Prints ONE JSON line. Required keys: {"metric", "value", "unit",
"vs_baseline"} — the headline is assembled-and-solved DOFs/s on one chip
for the full production step on the flagship pore problem (3048 nodes):
drift-diffusion reassembly + batched two-species Alexander2 DIRK stage
solves at 1e-5 + decoupled Poisson SLP re-solve at 1e-10, i.e. 3 * ndof
field dofs advanced per step, after a real PB Newton bootstrap.
vs_baseline compares against the previous round's value in
BENCH_BASELINE.json (the reference publishes no numbers, BASELINE.md).

Honest-reporting extras (VERDICT r1 item 9):
  * "config_overrides" — the one knob the bench changes from the shipped
    pore.cfg (iteration cap 20000 -> 3000: single TPU programs running
    ~100 s can trip the device watchdog; the equilibrium-bootstrapped
    solves converge in O(10^2) iterations, so the cap is slack, not a
    quality change);
  * "phases" — per-program timings of the headline step's two halves;
  * "scaled" — the same production pipeline on red-refined pore meshes
    (11839 / 46653 nodes) through the large-mesh block-RAS path
    (ras_refresh_every=4 factor amortization), the regime the dense fast
    path cannot reach. Sections degrade to null on failure rather than
    killing the headline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ITER_CAP = 3000


def _load(levels: int = 0):
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform

    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = min(cfg.linearSolverIterations, ITER_CAP)
    mesh = read_gmsh(cfg.meshfile)
    if levels:
        mesh = refine_uniform(mesh, levels)
    return cfg, FunctionSpace(mesh, 1)


def run_headline(n_meas: int = 10):
    import jax
    import jax.numpy as jnp
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg, space = _load(0)
    system = build_pnp_system(cfg, space)   # includes the PB Newton solve

    state = (system.uphi0, system.ucp0, system.ucm0)
    for _ in range(2):                      # warmup/compile
        state = system.fused_step(*state)
    jax.block_until_ready(state[0])

    t0 = time.perf_counter()
    for _ in range(n_meas):
        state = system.fused_step(*state)
    jax.block_until_ready(state[0])
    elapsed = time.perf_counter() - t0
    assert bool(jnp.isfinite(state[0]).all()), "non-finite state"
    value = 3 * space.ndof * n_meas / elapsed

    # per-phase: the step's two halves as their own programs
    phases = None
    try:
        ucp, ucm, _ = system.species_step(*state)
        jax.block_until_ready(ucp)
        t0 = time.perf_counter()
        for _ in range(n_meas):
            ucp, ucm, _ = system.species_step(state[0], ucp, ucm)
        jax.block_until_ready(ucp)
        sp_ms = (time.perf_counter() - t0) / n_meas * 1e3
        uphi, _ = system.poisson_solve(state[0], ucp, ucm)
        jax.block_until_ready(uphi)
        t0 = time.perf_counter()
        for _ in range(n_meas):
            uphi, _ = system.poisson_solve(uphi, ucp, ucm)
        jax.block_until_ready(uphi)
        po_ms = (time.perf_counter() - t0) / n_meas * 1e3
        phases = {"species_ms": round(sp_ms, 2), "poisson_ms": round(po_ms, 2),
                  "fused_step_ms": round(elapsed / n_meas * 1e3, 2)}
    except Exception as e:
        sys.stderr.write(f"phase timing skipped: {e}\n")
    return value, phases


def run_scaled(levels: int, n_meas: int = 4, refresh: int = 4):
    """Large-mesh path (block-RAS, factor amortized) on refined pore.

    Emits the per-phase breakdown VERDICT r2 item 2 demanded: species
    factor build / species stage solves (+iterations) / Poisson re-solve
    (+iterations), so the scaled regime is never an unprofiled single
    number again. The amortized-step headline divides the factor cost
    over the refresh cadence.
    """
    import jax
    import jax.numpy as jnp
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg, space = _load(levels)
    system = build_pnp_system(cfg, space)   # > 8192 dofs -> block-RAS path
    uphi, ucp, ucm = system.uphi0, system.ucp0, system.ucm0
    uphi, _ = system.poisson_solve(uphi, ucp, ucm)

    def step_block(uphi, ucp, ucm, n):
        factor = system.species_factor(uphi)
        for _ in range(n):
            uphi, ucp, ucm = system.fused_step_reuse(factor, uphi, ucp, ucm)
        return uphi, ucp, ucm

    uphi, ucp, ucm = step_block(uphi, ucp, ucm, 1)      # warmup/compile
    jax.block_until_ready(uphi)
    float(jnp.linalg.norm(uphi))                        # drain the queue
    t0 = time.perf_counter()
    uphi, ucp, ucm = step_block(uphi, ucp, ucm, n_meas)
    # a VALUE fetch, not just block_until_ready: the tunneled backend
    # has reported 0.2 ms for a 13 s two-step block with block_until_
    # ready alone (r5 L3 artifact; r2's "absurdly fast" lesson) — a
    # host-side scalar readback cannot be satisfied lazily
    _ = float(jnp.linalg.norm(uphi))
    elapsed = time.perf_counter() - t0
    assert bool(jnp.isfinite(uphi).all()), "non-finite state"
    out = {"nodes": space.ndof,
           "dofs_per_s": round(3 * space.ndof * n_meas / elapsed, 2),
           "step_ms": round(elapsed / n_meas * 1e3, 1),
           "ras_refresh_every": refresh}
    # per-phase breakdown (each as its own program, dependency-chained).
    # EVERY phase program is warmed once before its timed call: the r3
    # bench only ever warmed fused_step_reuse, so the timed
    # species_step_reuse call included its full remote compile and the
    # committed species_ms was ~150x the warm cost (VERDICT r3 item 3).
    try:
        factor = system.species_factor(uphi)
        ucp2, ucm2, sp_it = system.species_step_reuse(factor, uphi, ucp, ucm)
        uphi2, po_it = system.poisson_solve(uphi, ucp2, ucm2)
        jax.block_until_ready(uphi2)                    # warm all programs
        t0 = time.perf_counter()
        factor = system.species_factor(uphi2)           # depends on warmup
        jax.block_until_ready(factor)
        fa_ms = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        ucp2, ucm2, sp_it = system.species_step_reuse(factor, uphi2, ucp2,
                                                      ucm2)
        jax.block_until_ready(ucp2)
        sp_ms = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        uphi2, po_it = system.poisson_solve(uphi2, ucp2, ucm2)
        jax.block_until_ready(uphi2)
        po_ms = (time.perf_counter() - t0) * 1e3
        out["phases"] = {
            "species_factor_ms": round(fa_ms, 1),
            "species_ms": round(sp_ms, 1),
            "species_stage_iters": int(sp_it),
            "poisson_ms": round(po_ms, 1),
            "poisson_iters": int(po_it)}
        # cross-check: if the block timing is implausibly below the
        # individually-timed phase sum (lazy-dispatch artifact), report
        # the phase-derived amortized step instead and say so
        amortized = sp_ms + po_ms + fa_ms / refresh
        if out["step_ms"] < 0.25 * amortized:
            out["step_ms"] = round(amortized, 1)
            out["dofs_per_s"] = round(3 * space.ndof / (amortized / 1e3), 2)
            out["step_ms_source"] = "phase_sum (block timing implausible)"
    except Exception as e:
        sys.stderr.write(f"scaled L{levels} phase breakdown skipped: {e}\n")
    return out


def run_drybuild():
    """Preflight mode (tools/preflight.py): build the flagship system and
    run ONE production step on whatever backend is active (CPU in the
    gate) — catches broken imports/renames in the bench path without TPU
    time. Prints DRYBUILD-OK and exits 0 on success."""
    import jax
    import jax.numpy as jnp
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg, space = _load(0)
    system = build_pnp_system(cfg, space)
    state = system.fused_step(system.uphi0, system.ucp0, system.ucm0)
    jax.block_until_ready(state[0])
    assert bool(jnp.isfinite(state[0]).all()), "non-finite state"
    print("DRYBUILD-OK")


def main():
    import subprocess
    if len(sys.argv) >= 2 and sys.argv[1] == "--drybuild":
        run_drybuild()
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--scaled":
        # subprocess mode: one level per process — a 16 GB chip cannot
        # hold the 46k Poisson inverse next to another level's buffers
        out = run_scaled(int(sys.argv[2]), n_meas=int(sys.argv[3]))
        print("SCALED-JSON:" + json.dumps(out))
        return
    value = phases = None
    for attempt in range(2):
        try:
            value, phases = run_headline()
            break
        except Exception as e:
            sys.stderr.write(f"bench attempt {attempt} failed: {e}\n")
            time.sleep(5)
    if value is None:
        print(json.dumps({"metric": "pore_pnp_production_step_dofs_per_s_per_chip",
                          "value": 0.0, "unit": "DOF/s", "vs_baseline": 0.0}))
        return

    scaled = []
    me = os.path.abspath(__file__)
    for levels, n_meas in ((1, 4), (2, 4), (3, 2)):
        # one retry per level: the L2 very-large-inverse tier OOMed once
        # right after a heavy session (r4 soak log) and succeeded on
        # retry — a transient co-tenant/allocator state on the tunneled
        # chip must not null a committed bench section
        result = None
        for attempt in range(2):
            try:
                r = subprocess.run(
                    [sys.executable, "-u", me, "--scaled", str(levels),
                     str(n_meas)],
                    capture_output=True, text=True,
                    # the 185k-node level pays ~all its wall time in the
                    # PB Newton bootstrap + remote compiles (r4 repro:
                    # ~55 min before the f32-inner Krylov landed)
                    timeout=3600 if levels < 3 else 5800)
                line = [l for l in r.stdout.splitlines()
                        if l.startswith("SCALED-JSON:")]
                if not line:
                    raise RuntimeError(
                        f"rc={r.returncode}: {r.stderr[-800:]}")
                result = json.loads(line[-1][len("SCALED-JSON:"):])
                break
            except Exception as e:
                sys.stderr.write(
                    f"scaled L{levels} attempt {attempt} failed: {e}\n")
                time.sleep(20)
        scaled.append(result)

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
        "config_overrides": {
            "linearSolverIterations": f"20000 -> {ITER_CAP} "
            "(TPU watchdog cap; solves converge in O(10^2) its)"},
        "phases": phases,
        "scaled": scaled,
    }))


if __name__ == "__main__":
    main()

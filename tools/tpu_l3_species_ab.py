"""species_two_level decision at LEVEL 3 (VERDICT r4 item 5).

The 46k A/B declined the two-level species preconditioner (iteration cut
22 -> 17 did not pay for the coarse's two extra operator applies per
application: 898 vs 766 ms). L3 (185,209 nodes) is the regime it was
BUILT for — species runs 42-43 iterations there and the coarse's fixed
cost amortizes over more work per iteration. One process, one PB
bootstrap (shared pb_field), two system builds, identical presolved
protocol: factor refresh + 3 reuse-steps each, per-step species
iterations and wall time.

Reference bar: the species SLP solves at tol 1e-5,
/root/reference/src/instationary_pnp_from_pb_md.hh:383-386.
"""

import gc
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def run_variant(cfg, space, pb, two_level: bool):
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    label = "two-level" if two_level else "one-level"
    t0 = time.perf_counter()
    system = build_pnp_system(cfg, space, pb_field=pb,
                              species_two_level=two_level)
    print(f"[{label}] build: {time.perf_counter() - t0:.1f} s", flush=True)
    uphi, po_it = system.poisson_solve(system.uphi0, system.ucp0,
                                       system.ucm0)
    jax.block_until_ready(uphi)
    ucp, ucm = system.ucp0, system.ucm0

    # warm factor + step programs
    factor = system.species_factor(uphi)
    ucp, ucm, sp_it = system.species_step_reuse(factor, uphi, ucp, ucm)
    uphi, po_it = system.poisson_solve(uphi, ucp, ucm)
    jax.block_until_ready(uphi)

    t0 = time.perf_counter()
    factor = system.species_factor(uphi)
    jax.block_until_ready(factor)
    fa_ms = (time.perf_counter() - t0) * 1e3
    print(f"[{label}] species_factor: {fa_ms:.0f} ms", flush=True)

    tot_sp = 0.0
    for i in range(3):
        t0 = time.perf_counter()
        ucp, ucm, sp_it = system.species_step_reuse(factor, uphi, ucp, ucm)
        jax.block_until_ready(ucp)
        sp_ms = (time.perf_counter() - t0) * 1e3
        tot_sp += sp_ms
        t0 = time.perf_counter()
        uphi, po_it = system.poisson_solve(uphi, ucp, ucm)
        jax.block_until_ready(uphi)
        po_ms = (time.perf_counter() - t0) * 1e3
        fin = bool(jnp.isfinite(uphi).all() & jnp.isfinite(ucp).all())
        print(f"[{label}] step {i}: species {sp_ms:.0f} ms/{int(sp_it)} its"
              f" | poisson {po_ms:.0f} ms/{int(po_it)} its | finite={fin}",
              flush=True)
        assert fin
    print(f"[{label}] species avg over 3 reuse-steps: {tot_sp / 3:.0f} ms",
          flush=True)
    del system
    gc.collect()
    return tot_sp / 3


def main():
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform
    from pnp_tpu.workloads.pb import solve_pb

    assert jax.default_backend() == "tpu"
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(refine_uniform(read_gmsh(cfg.meshfile), 3), 1)
    print(f"ndof={space.ndof}", flush=True)
    t0 = time.perf_counter()
    pb = np.asarray(solve_pb(cfg, space).u)
    print(f"PB bootstrap: {time.perf_counter() - t0:.1f} s", flush=True)

    one = run_variant(cfg, space, pb, two_level=False)
    two = run_variant(cfg, space, pb, two_level=True)
    print(f"VERDICT: one-level {one:.0f} ms vs two-level {two:.0f} ms "
          f"({'TWO-LEVEL WINS' if two < one else 'one-level stays'})",
          flush=True)
    print("L3-SPECIES-AB-OK", flush=True)


if __name__ == "__main__":
    main()

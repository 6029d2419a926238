"""Level-4 (739k-node) capability probe — the next scale decade.

r4 broke the 48k ceiling and ran the 185k-node level 3 at 13.5 s/step;
the reference's bar is "any mesh DUNE can hold"
(/root/reference/src/instationary_pnp_from_pb_md.hh:185-186). This
probes whether the element-chunked assembly + tiered solvers reach
level 4 (~739k nodes / ~1.47M elements) on one chip:

  * host-side: mesh refine, block context (python loops scale with E),
  * PB Newton (chunked jacobians, f32-inner block-RAS solves),
  * one production step (species factor + stages + two-level Poisson).

Memory napkin: RAS local inverses (K~2890, L~400) f32 ~ 1.8 GB per
system-set; element tables ~ a few hundred MB; no dense N^2 object.
Run via run_in_background with a LONG timeout (PB at L3 took 481 s;
expect ~4x).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def mem(tag):
    s = jax.local_devices()[0].memory_stats() or {}
    print(f"[mem {tag}] in_use={s.get('bytes_in_use', 0)/2**30:.2f} GiB "
          f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f} "
          f"limit={s.get('bytes_limit', 0)/2**30:.2f}", flush=True)
    try:
        arrs = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)[:12]
        for a in arrs:
            print(f"    live {a.nbytes/2**20:8.1f} MiB {a.dtype} "
                  f"{a.shape}", flush=True)
    except Exception as e:
        print(f"    live-array census failed: {e}", flush=True)


def main():
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    assert jax.default_backend() == "tpu"
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    t0 = time.perf_counter()
    mesh = refine_uniform(read_gmsh(cfg.meshfile), 4)
    space = FunctionSpace(mesh, 1)
    print(f"host mesh+space: {time.perf_counter() - t0:.1f} s | "
          f"ndof={space.ndof} E={mesh.num_tris}", flush=True)

    t0 = time.perf_counter()
    system = build_pnp_system(cfg, space)
    print(f"build (incl. PB Newton): {time.perf_counter() - t0:.1f} s | "
          f"pb_its={system.pb_newton_iterations}", flush=True)

    mem("post-build")
    uphi, ucp, ucm = system.uphi0, system.ucp0, system.ucm0
    t0 = time.perf_counter()
    uphi, po_it = system.poisson_solve(uphi, ucp, ucm)
    jax.block_until_ready(uphi)
    print(f"poisson presolve(+compile): {time.perf_counter() - t0:.1f} s "
          f"({int(po_it)} its)", flush=True)

    mem("pre-factor")
    t0 = time.perf_counter()
    factor = system.species_factor(uphi)
    jax.block_until_ready(factor)
    print(f"species factor(+compile): {time.perf_counter() - t0:.1f} s",
          flush=True)
    mem("post-factor")

    for i in range(3):
        t0 = time.perf_counter()
        ucp, ucm, sp_it = system.species_step_reuse(factor, uphi, ucp, ucm)
        uphi, po_it = system.poisson_solve(uphi, ucp, ucm)
        jax.block_until_ready(uphi)
        fin = bool(jnp.isfinite(uphi).all() & jnp.isfinite(ucp).all()
                   & jnp.isfinite(ucm).all())
        print(f"step {i}: {time.perf_counter() - t0:.1f} s | species "
              f"{int(sp_it)} its | poisson {int(po_it)} its | "
              f"finite={fin}", flush=True)
        assert fin
    print("L4-PROBE-OK", flush=True)


if __name__ == "__main__":
    main()

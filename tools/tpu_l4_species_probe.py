"""Minimal repro of the L4 species-factor inversion memory wall.

The full L4 probe pays ~8-10 min of PB Newton before reaching the
failing program (tools/l4_probe_r5{b..i}.log); this goes straight
there: build the level-4 space, assemble the (2, K, 403, 403)
species-stage local matrices from a synthetic-but-realistically-shaped
stage operator (mass + diffusion at phi = 0 — same sparsity, same
block geometry), print a live-array census, then run the out-of-core
chunked inversion (solvers/block_ras.py:invert_local_matrices_outofcore)
with PNP_TPU_INV_CHUNK. One run maps the factor-memory space in ~4 min.
"""

import os
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
        arrs = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)[:10]
        for a in arrs:
            print(f"    live {a.nbytes/2**20:8.1f} MiB {a.dtype} "
                  f"{a.shape}", flush=True)
    except Exception as e:
        print(f"    census failed: {e}", flush=True)


def main(levels=4):
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.geometry import build_volume_tables
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.fem import constraints as C
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform
    from pnp_tpu.operators import volume as V
    from pnp_tpu.solvers import block_ras as BR
    from pnp_tpu.utils.hoist import jit_hoisted

    assert jax.default_backend() == "tpu"
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    t0 = time.perf_counter()
    mesh = refine_uniform(read_gmsh(cfg.meshfile), levels)
    space = FunctionSpace(mesh, 1)
    vt2 = build_volume_tables(space, 2)
    ctx_ras = BR.build_block_context_for_space(space, 256)
    free_pair = jnp.stack([
        jnp.asarray(C.free_dof_mask(space, cfg, 1)),
        jnp.asarray(C.free_dof_mask(space, cfg, 2))])
    print(f"host: {time.perf_counter() - t0:.1f} s | ndof={space.ndof} "
          f"E={mesh.num_tris} K={ctx_ras.K} L={ctx_ras.L}", flush=True)

    from pnp_tpu.operators.common import interp_grad, map_table_chunks

    @jit_hoisted
    def assemble(zero_phi):
        # stage-shaped pair: M + dt * K(phi = 0) — same block geometry
        # and magnitude class as the production species stage matrices
        M = V.mass_jacobian_el(vt2, 1.0, False, cfg.pi)

        def body(tc, ue_c):
            gphi = interp_grad(ue_c, tc.gradphi)
            return (V.drift_diffusion_jacobian_el(gphi, tc, +1.0, False,
                                                  cfg.pi),
                    V.drift_diffusion_jacobian_el(gphi, tc, -1.0, False,
                                                  cfg.pi))

        K_cp, K_cm = map_table_chunks(body, vt2, (zero_phi[vt2.dofmap],))
        A_pair = jnp.stack([M + cfg.tau * K_cp, M + cfg.tau * K_cm])
        return BR.assemble_local_matrices(ctx_ras, A_pair, free_pair)

    t0 = time.perf_counter()
    A_loc = assemble(jnp.zeros(space.ndof))
    jax.block_until_ready(A_loc)
    print(f"assemble(+compile): {time.perf_counter() - t0:.1f} s "
          f"shape={A_loc.shape}", flush=True)
    mem("pre-invert")

    t0 = time.perf_counter()
    inv = BR.invert_local_matrices_outofcore(A_loc)
    jax.block_until_ready(inv)
    print(f"ooc invert(+compile): {time.perf_counter() - t0:.1f} s "
          f"chunk={os.environ.get('PNP_TPU_INV_CHUNK', '512')}",
          flush=True)
    mem("post-invert")
    fin = bool(jnp.isfinite(inv).all())
    print(f"finite={fin}", flush=True)
    # warm re-run (refresh-cadence cost)
    t0 = time.perf_counter()
    inv2 = BR.invert_local_matrices_outofcore(inv)
    jax.block_until_ready(inv2)
    print(f"ooc invert (warm): {time.perf_counter() - t0:.1f} s", flush=True)
    print("L4-SPECIES-PROBE-OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)

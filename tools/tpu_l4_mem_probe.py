"""Level-4 PB-solve memory autopsy.

The hoisted L4 probe cleared the HTTP 413 but the first PB Newton
SOLVE program died RESOURCE_EXHAUSTED on the 16 GB chip. This builds
the PB pieces one program at a time and prints device memory stats
between them to find the allocation that blows.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def mem(tag):
    s = jax.local_devices()[0].memory_stats() or {}
    ib = s.get("bytes_in_use", 0)
    pk = s.get("peak_bytes_in_use", 0)
    lim = s.get("bytes_limit", 0)
    print(f"[mem {tag}] in_use={ib/2**30:.2f} GiB peak={pk/2**30:.2f} "
          f"limit={lim/2**30:.2f}", flush=True)


def main(levels=4):
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform
    from pnp_tpu.workloads.common import make_scalar_context
    from pnp_tpu.workloads.pb import (make_pb_residual,
                                      make_pb_assemble_solve)

    assert jax.default_backend() == "tpu"
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 500
    t0 = time.perf_counter()
    mesh = refine_uniform(read_gmsh(cfg.meshfile), levels)
    space = FunctionSpace(mesh, 1)
    print(f"host mesh+space: {time.perf_counter() - t0:.1f} s | "
          f"ndof={space.ndof} E={mesh.num_tris}", flush=True)
    ctx = make_scalar_context(cfg, space, component=0, quad_order=3)
    mem("tables")

    from pnp_tpu.solvers import block_ras as BR
    ctx_ras = BR.build_block_context_for_space(space, 256)
    print(f"RAS: K={ctx_ras.K} B={ctx_ras.B} L={ctx_ras.L}", flush=True)
    mem("ras-ctx")

    residual = make_pb_residual(ctx)
    u = jnp.zeros(ctx.ndof)
    t0 = time.perf_counter()
    r = residual(u)
    jax.block_until_ready(r)
    print(f"residual(+compile): {time.perf_counter() - t0:.1f} s", flush=True)
    mem("residual")

    assemble, solve = make_pb_assemble_solve(ctx)
    t0 = time.perf_counter()
    A_el, factor = assemble(u)
    jax.block_until_ready(factor)
    print(f"assemble(+compile): {time.perf_counter() - t0:.1f} s | "
          f"A_el {A_el.shape} {A_el.dtype} | factor {factor.shape} "
          f"{factor.dtype}", flush=True)
    mem("assemble")

    t0 = time.perf_counter()
    z, k = solve((A_el, factor), r, 1e-3)
    jax.block_until_ready(z)
    print(f"solve(+compile): {time.perf_counter() - t0:.1f} s | "
          f"{int(k)} its | finite={bool(jnp.isfinite(z).all())}", flush=True)
    mem("solve")
    print("L4-MEM-OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)

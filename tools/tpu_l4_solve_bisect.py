"""Bisect the L4 PB-solve RESOURCE_EXHAUSTED.

tools/l4_mem_probe.log: residual + assemble + 2883x403^2 factor all fit,
the solve program OOMs at run. Pieces, each its own program:
  a) mixed (f32) constrained operator apply
  b) f64 constrained operator apply
  c) RAS preconditioner apply
  d) M(op(x)) chained pair
  e) bicgstab, 3 iterations
  f) bicgstab, 100 iterations
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def timed(tag, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"  [{tag}] {time.perf_counter() - t0:.2f} s "
          f"(finite={bool(jnp.isfinite(jax.tree_util.tree_leaves(out)[0]).all())})",
          flush=True)
    return out


def main(levels=4):
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.fem import assembly as FA
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform
    from pnp_tpu.workloads.common import make_scalar_context
    from pnp_tpu.workloads.pb import make_pb_residual, make_pb_assemble_solve
    from pnp_tpu.solvers import block_ras as BR
    from pnp_tpu.solvers.krylov import bicgstab
    from pnp_tpu.utils.hoist import jit_hoisted

    assert jax.default_backend() == "tpu"
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    mesh = refine_uniform(read_gmsh(cfg.meshfile), levels)
    space = FunctionSpace(mesh, 1)
    print(f"ndof={space.ndof} E={mesh.num_tris}", flush=True)
    ctx = make_scalar_context(cfg, space, component=0, quad_order=3)
    ctx_ras = BR.build_block_context_for_space(space, 256)
    print(f"K={ctx_ras.K} L={ctx_ras.L}", flush=True)

    residual = make_pb_residual(ctx)
    assemble, _ = make_pb_assemble_solve(ctx)
    u = jnp.zeros(ctx.ndof)
    r = timed("residual", residual, u)
    A_el, factor = timed("assemble", assemble, u)

    ndof = ctx.ndof
    free = ctx.free

    def op32_apply(a_el, x):
        op = FA.make_constrained_operator_mixed(a_el, ctx.dofmap, ndof, free)
        return op(x)

    def op64_apply(a_el, x):
        op = FA.make_constrained_operator(a_el, ctx.dofmap, ndof, free)
        return op(x)

    def ras_apply(fac, x):
        M = BR.make_ras_precond(ctx_ras, fac, free)
        return M(x)

    def chained(a_el, fac, x):
        op = FA.make_constrained_operator_mixed(a_el, ctx.dofmap, ndof, free)
        M = BR.make_ras_precond(ctx_ras, fac, free)
        return M(op(x))

    def krylov_n(a_el, fac, rhs, n):
        op = FA.make_constrained_operator_mixed(a_el, ctx.dofmap, ndof, free)
        M = BR.make_ras_precond(ctx_ras, fac, free)
        res = bicgstab(op, rhs, jnp.zeros_like(rhs), M, 1e-12, n)
        return res.x, res.iterations

    r32 = r.astype(jnp.float32)
    timed("op32", jit_hoisted(op32_apply), A_el, r32)
    timed("op64", jit_hoisted(op64_apply), A_el, r)
    timed("ras", jit_hoisted(ras_apply), factor, r32)
    timed("chain", jit_hoisted(chained), A_el, factor, r32)
    import functools
    timed("bicgstab3", jit_hoisted(functools.partial(krylov_n, n=3)),
          A_el, factor, r32)
    x, k = timed("bicgstab100", jit_hoisted(functools.partial(krylov_n, n=100)),
                 A_el, factor, r32)
    print(f"its={int(k)}", flush=True)
    print("L4-BISECT-OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)

"""Level-3 (185k-node) per-op cost profile.

The first-ever L3 step (BENCH r4 path) is 24.5 s: poisson 17.0 s / 32
its (~530 ms per two-level-RAS BiCGSTAB iteration) and species 6.1 s /
43 its (~140 ms/it) — both 10-100x above a bandwidth estimate for the
underlying streams. This tool times every piece of one Krylov iteration
in isolation at L3 scale so the dominant cost (lane-padded spmv temps?
f64-emulated vector recurrences? gather/scatter latency? the coarse
correction?) is identified rather than guessed.

PB Newton is skipped (pb_field=0): apply COSTS don't depend on field
values. Run via run_in_background, >=30 min timeout.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *a, n=8):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"  {label}: {ms:.2f} ms", flush=True)
    return out, ms


def main(levels=3):
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.fem import assembly as FA
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform
    from pnp_tpu.workloads.common import make_scalar_context
    from pnp_tpu.operators import volume as V
    from pnp_tpu.solvers import block_ras as BR
    from pnp_tpu.solvers.krylov import bicgstab

    assert jax.default_backend() == "tpu"
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    mesh = refine_uniform(read_gmsh(cfg.meshfile), levels)
    space = FunctionSpace(mesh, 1)
    ndof = space.ndof
    print(f"ndof={ndof} E={mesh.num_tris}", flush=True)
    ctx_phi = make_scalar_context(cfg, space, component=0, quad_order=3)
    vt = ctx_phi.vt
    t0 = time.perf_counter()

    @jax.jit
    def _build():
        return V.poisson_jacobian_el(vt, cfg.cylindrical, cfg.pi)

    A_el = _build()
    jax.block_until_ready(A_el)
    print(f"A_el build(+compile): {time.perf_counter() - t0:.1f} s",
          flush=True)
    timeit("A_el rebuild (chunked kernel)", _build, n=4)

    ctx_ras = BR.build_block_context_for_space(space, 256)
    print(f"RAS blocks: K={ctx_ras.K} B={ctx_ras.B} L={ctx_ras.L}",
          flush=True)

    @jax.jit
    def _ras_setup(a):
        inv = BR.build_local_inverses(ctx_ras, a, ctx_phi.free)
        p1 = BR.build_p1_coarse(ctx_ras, a, vt.dofmap, ctx_phi.free,
                                space.dof_coords)
        return inv, p1

    t0 = time.perf_counter()
    inv, p1 = _ras_setup(A_el)
    jax.block_until_ready(inv)
    print(f"RAS setup(+compile): {time.perf_counter() - t0:.1f} s",
          flush=True)

    free = ctx_phi.free
    op64 = FA.make_constrained_operator(A_el, vt.dofmap, ndof, free)
    op32 = FA.make_constrained_operator_mixed(A_el, vt.dofmap, ndof, free)

    r = jnp.where(free, jnp.sin(jnp.arange(ndof) * 0.7), 0.0)
    r32 = r.astype(jnp.float32)
    # factors are RUNTIME ARGUMENTS everywhere (a 450 MB closure constant
    # trips the remote compiler's request-body limit, CLAUDE.md r3)
    timeit("op f64 apply", jax.jit(lambda x: op64(x)), r)
    timeit("op f32-mixed apply (f64 io)", jax.jit(lambda x: op32(x)), r)
    timeit("op f32-mixed apply (f32 io)", jax.jit(lambda x: op32(x)), r32)
    timeit("RAS apply (f64 io)",
           jax.jit(lambda iv, x: BR.make_ras_precond(ctx_ras, iv, free)(x)),
           inv, r)
    timeit("RAS apply (f32 io)",
           jax.jit(lambda iv, x: BR.make_ras_precond(ctx_ras, iv, free)(x)),
           inv, r32)
    timeit("p1 coarse apply",
           jax.jit(lambda p, x: BR.make_p1_coarse_correction(
               ctx_ras, p, free)(x)), p1, r)
    timeit("two-level apply (f64 io)",
           jax.jit(lambda iv, p, x: BR.make_two_level_precond(
               ctx_ras, iv, None, op32, free, p1_coarse=p)(x)), inv, p1, r)
    timeit("f64 dot", jax.jit(lambda x: jnp.vdot(x, x)), r)
    timeit("f64 axpy", jax.jit(lambda x: x + 0.5 * x), r)
    timeit("f32 dot", jax.jit(lambda x: jnp.vdot(x, x)), r32)
    timeit("f32 axpy", jax.jit(lambda x: x + 0.5 * x), r32)

    @jax.jit
    def solve5(iv, p, rr):
        two = BR.make_two_level_precond(ctx_ras, iv, None, op32, free,
                                        p1_coarse=p)
        res = bicgstab(op32, rr, jnp.zeros_like(rr), two, 1e-30, 5)
        return res.x

    _, ms5 = timeit("bicgstab 5 its (f64 vectors)", solve5, inv, p1, r, n=3)
    print(f"  -> per-iteration {ms5 / 5:.1f} ms", flush=True)
    _, ms5b = timeit("bicgstab 5 its (f32 vectors)", solve5, inv, p1, r32,
                     n=3)
    print(f"  -> per-iteration {ms5b / 5:.1f} ms", flush=True)

    # species-shaped batched pieces
    free_pair = jnp.stack([free, free])
    A_pair = jnp.stack([A_el, A_el])
    op_b = FA.make_constrained_operator_mixed(A_pair, vt.dofmap, ndof,
                                              free_pair)
    rb = jnp.stack([r, r])
    timeit("batched(2) f32 op apply (f64 io)", jax.jit(lambda x: op_b(x)),
           rb)
    timeit("batched(2) f32 op apply (f32 io)", jax.jit(lambda x: op_b(x)),
           rb.astype(jnp.float32))

    @jax.jit
    def _ras_stage(a):
        return BR.build_local_inverses(ctx_ras, jnp.stack([a, a]),
                                       free_pair)

    t0 = time.perf_counter()
    inv2 = _ras_stage(A_el)
    jax.block_until_ready(inv2)
    print(f"stage factor build(+compile): {time.perf_counter() - t0:.1f} s",
          flush=True)
    timeit("stage factor rebuild", _ras_stage, A_el, n=2)
    timeit("batched RAS apply (f64 io)",
           jax.jit(lambda iv, x: BR.make_ras_precond(ctx_ras, iv,
                                                     free_pair)(x)),
           inv2, rb)
    timeit("batched RAS apply (f32 io)",
           jax.jit(lambda iv, x: BR.make_ras_precond(ctx_ras, iv,
                                                     free_pair)(x)),
           inv2, rb.astype(jnp.float32))
    print("L3-PROFILE-OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)

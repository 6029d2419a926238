"""AMG role decision (VERDICT r2 item 9): CG+AMG vs BiCGSTAB+two-level RAS.

Solves the SAME constant-Poisson 1e-10 system of the production pipeline
on the level-2 refined pore mesh (46,653 nodes) with both solver options
and reports iterations + dependency-chained wall time per solve. The
outcome decides whether CG_AMG_SSOR stays a peer production option (with
this timing as its evidence) or is marked parity-only in PARITY.md.

Runs on whatever backend is live (TPU in production; CPU with the test
conftest). Line-buffered; run in background on TPU.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.fem import assembly as FA
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform
    from pnp_tpu.operators import volume as V
    from pnp_tpu.fem.geometry import build_volume_tables
    from pnp_tpu.workloads.common import make_scalar_context
    from pnp_tpu.solvers import block_ras as BR
    from pnp_tpu.solvers.krylov import bicgstab, cg
    from pnp_tpu.solvers.amg import make_amg_context, two_level_precond

    print("backend:", jax.default_backend(), flush=True)
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    mesh = refine_uniform(read_gmsh(cfg.meshfile), 2)
    space = FunctionSpace(mesh, 1)
    print("ndof:", space.ndof, flush=True)
    ctx_phi = make_scalar_context(cfg, space, component=0, quad_order=3)
    ndof = space.ndof

    @jax.jit
    def _setup():
        A_el = V.poisson_jacobian_el(ctx_phi.vt, cfg.cylindrical, cfg.pi)
        d = FA.constrained_diagonal(A_el, ctx_phi.vt.dofmap, ndof,
                                    ctx_phi.free)
        return A_el, d

    A_el, diag = _setup()
    op = FA.make_constrained_operator(A_el, ctx_phi.vt.dofmap, ndof,
                                      ctx_phi.free)
    # synthetic smooth+rough rhs on free dofs
    x = jnp.asarray(space.dof_coords)
    b = jnp.where(ctx_phi.free,
                  jnp.sin(3.0 * x[:, 0]) + 0.3 * jnp.cos(17.0 * x[:, 1]),
                  0.0)

    # --- option A: BiCGSTAB + two-level block-RAS (production default) ----
    ctx_ras = BR.build_block_context_for_space(space, 256)

    @jax.jit
    def ras_setup(A_el_):
        inv = BR.build_local_inverses(ctx_ras, A_el_, ctx_phi.free)
        p1 = BR.build_p1_coarse(ctx_ras, A_el_, ctx_phi.vt.dofmap,
                                ctx_phi.free, space.dof_coords)
        return inv, p1

    inv, p1 = ras_setup(A_el)

    @jax.jit
    def solve_ras(inv_, p1_, bb):
        M = BR.make_two_level_precond(ctx_ras, inv_, None, op, ctx_phi.free,
                                      p1_coarse=p1_)
        res = bicgstab(op, bb, jnp.zeros_like(bb), M, 1e-10, 3000)
        return res.x, res.iterations

    # --- option B: CG + two-level aggregation AMG (CG_AMG_SSOR) -----------
    amg_ctx = make_amg_context(np.asarray(space.dofmap), ndof,
                               np.asarray(ctx_phi.free),
                               dof_coords=space.dof_coords)

    @jax.jit
    def solve_amg(A_el_, bb):
        M = two_level_precond(A_el_, amg_ctx, diag, ctx_phi.free)
        res = cg(op, bb, jnp.zeros_like(bb), M, 1e-10, 3000)
        return res.x, res.iterations

    def timeit(label, fn, *a, n=3):
        out = fn(*a)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        bb = a[-1]
        for _ in range(n):
            x_, it_ = fn(*a[:-1], bb)
            bb = bb + 1e-14 * x_          # dependency chain
        jax.block_until_ready(x_)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"  {label}: {ms:.1f} ms, iters={int(it_)}", flush=True)
        return x_, ms

    x_ras, ms_ras = timeit("BiCGSTAB + two-level RAS", solve_ras, inv, p1, b)
    x_amg, ms_amg = timeit("CG + AMG (CG_AMG_SSOR)", solve_amg, A_el, b)
    for name, xx in (("ras", x_ras), ("amg", x_amg)):
        rr = float(jnp.linalg.norm(jnp.where(ctx_phi.free, b - op(xx), 0.0))
                   / jnp.linalg.norm(b))
        print(f"  true relres {name}: {rr:.2e}", flush=True)
    print(f"AMG/RAS wall ratio: {ms_amg / ms_ras:.2f}", flush=True)
    print("AMG-COMPARE-OK", flush=True)


if __name__ == "__main__":
    main()

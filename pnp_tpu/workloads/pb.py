"""Phase A: nonlinear Poisson-Boltzmann solve.

Parity: reference src/instationary_pnp_from_pb_md.hh:125-228 — P_k space on
the full mesh, coulomb (component 0) BC table, Newton with
Hackbusch-Reusken accept-best line search over the five config knobs,
Krylov backend selected by config.

Reference behavioral note reproduced here: the reference never interpolates
Dirichlet values into the PB initial iterate (pbu = 0.0 at
src/instationary_pnp_from_pb_md.hh:145 and PDELab Newton leaves constrained
dofs untouched), so PB is effectively solved with phi = 0 on all Dirichlet
surfaces regardless of configured coulombPotential. Pass
``dirichlet_from_config=True`` to impose the configured values instead
(documented deviation switch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Sysparams
from ..fem import assembly as A
from ..fem.space import FunctionSpace
from ..operators import volume as V
from ..solvers.newton import newton_solve, NewtonParams, NewtonResult
from ..solvers.linear_problem import make_krylov_solver
from .common import ScalarContext, make_scalar_context


def make_pb_residual(ctx: ScalarContext):
    sys = ctx.sys
    # huge meshes: the order-3 tables captured here are ~400 MB at the
    # 1.47M-element level-4 pore — hoisted to runtime arguments so the
    # remote-compile request stays under its body-size limit (utils/hoist)
    from ..utils.hoist import select_jit
    _jit = select_jit(ctx.vt.num_elements)

    @_jit
    def residual(u):
        ue = u[ctx.dofmap]
        r_el = V.pb_residual_el(ue, ctx.vt, sys.l_b, sys.c0, sys.cylindrical, sys.pi)
        r = ctx.scatter(r_el) + ctx.flux_vector
        return ctx.constrain(r)

    return residual


def make_pb_assemble_solve(ctx: ScalarContext, ras_threshold: int = 8192,
                           ras_block_size: int = 256):
    """Split (assemble, solve) pair for the reassemble-threshold Newton.

    ``assemble(u)`` builds the Jacobian context — element blocks plus the
    preconditioner factors (block-RAS local inverses above
    ``ras_threshold`` dofs, the large-mesh stand-in for SSOR; assembled
    diagonal below) — as ONE jitted program; ``solve(jac_ctx, r, red)``
    runs the configured Krylov variant with it. ``newtonReassembleThreshold``
    (reference binding src/instationary_pnp_from_pb_md.hh:218) skips
    ``assemble`` on fast-converging iterations."""
    sys = ctx.sys
    amg_ctx = None
    if sys.linearSolver == "CG_AMG_SSOR":
        from ..solvers.amg import make_amg_context
        amg_ctx = make_amg_context(ctx.dofmap, ctx.ndof, ctx.free,
                                   dof_coords=ctx.space.dof_coords)
    krylov = make_krylov_solver(sys.linearSolver, sys.linearSolverIterations,
                                amg_ctx=amg_ctx)
    ctx_ras = None
    if sys.linearSolver == "BCGS_SSORk" and ctx.ndof > ras_threshold:
        from ..solvers import block_ras as BR
        ctx_ras = BR.build_block_context_for_space(ctx.space, ras_block_size)

    # huge meshes: hoist the captured element tables out of the compile
    # request (see make_pb_residual)
    from ..utils.hoist import select_jit
    _jit = select_jit(ctx.vt.num_elements)

    @_jit
    def _jac(u):
        ue = u[ctx.dofmap]
        return V.pb_jacobian_el(ue, ctx.vt, sys.l_b, sys.c0, sys.cylindrical,
                                sys.pi)

    @_jit
    def _factor(A_el):
        if ctx_ras is not None:
            from ..solvers import block_ras as BR
            return BR.build_local_inverses(ctx_ras, A_el, ctx.free)
        return A.constrained_diagonal(A_el, ctx.dofmap, ctx.ndof, ctx.free)

    # level-4 meshes additionally split RAS assembly from inversion:
    # fused, XLA's buffer assignment keeps both halves' peaks alive at
    # once and the (K, 403, 403) factor program RESOURCE_EXHAUSTEDs
    # while each half fits (tools/l4_factor_bisect.log)
    from ..utils.hoist import hoist_needed
    _split_factor = ctx_ras is not None and hoist_needed(
        ctx.vt.num_elements)
    if _split_factor:
        from ..solvers import block_ras as BR

        @_jit
        def _factor_assemble(A_el):
            return BR.assemble_local_matrices(ctx_ras, A_el, ctx.free)

        # host-orchestrated chunked in-place inversion (L4 HBM): the
        # whole-batch (5766, 403, 403) LU wants 21.7 GB of temps and
        # in-jit chunking still OOMs next to the live factors
        _factor_invert = BR.invert_local_matrices_outofcore

    def assemble(u):
        # TWO programs on purpose: fusing Jacobian build + RAS
        # factorization into one made XLA remat-compress the element
        # tables into a catastrophically lane-padded bf16 copy (42x,
        # compile-time HBM OOM at the 185k-node level-3 pore)
        A_el = _jac(u)
        if _split_factor:
            return A_el, _factor_invert(_factor_assemble(A_el))
        return A_el, _factor(A_el)

    @_jit
    def solve(jac_ctx, r, reduction):
        A_el, factor = jac_ctx
        op = A.make_constrained_operator(A_el, ctx.dofmap, ctx.ndof, ctx.free)
        if ctx_ras is not None:
            from ..solvers import block_ras as BR
            from ..solvers.krylov import bicgstab, f32_inner_enabled
            M = BR.make_ras_precond(ctx_ras, factor, ctx.free)
            rs = ctx.constrain(r)
            if f32_inner_enabled():
                # Newton correction solve at >= min_linear_reduction
                # (1e-3-ish): f32 vectors + the true-f32 element operator
                # suffice; the f64 Newton defect outside keeps accuracy
                rs = rs.astype(jnp.float32)
                op = A.make_constrained_operator_mixed(
                    A_el, ctx.dofmap, ctx.ndof, ctx.free)
            res = bicgstab(op, rs, jnp.zeros_like(rs), M,
                           reduction, sys.linearSolverIterations)
            return res.x.astype(r.dtype), res.iterations
        res = krylov(op, ctx.constrain(r), jnp.zeros_like(r), factor,
                     reduction, A_el=A_el)
        return res.x, res.iterations

    return assemble, solve


def make_pb_linear_solver(ctx: ScalarContext, ras_threshold: int = 8192,
                          ras_block_size: int = 256):
    """Combined per-iteration assembly + solve (always reassembles)."""
    assemble, solve = make_pb_assemble_solve(ctx, ras_threshold,
                                             ras_block_size)

    def combined(u, r, reduction):
        return solve(assemble(u), r, reduction)

    return combined


def solve_pb(sys: Sysparams, space: FunctionSpace,
             dirichlet_from_config: bool = False,
             quad_order: int = 3) -> NewtonResult:
    ctx = make_scalar_context(sys, space, component=0, quad_order=quad_order)
    u0 = jnp.zeros(ctx.ndof)
    if dirichlet_from_config:
        u0 = jnp.where(ctx.free, u0, ctx.dirichlet)
    params = NewtonParams(
        reduction=sys.newtonReduction,
        min_linear_reduction=sys.newtonMinLinearReduction,
        max_iterations=int(sys.newtonMaxIterations),
        line_search_max=int(sys.newtonLineSearchMaxIteration),
        verbosity=sys.verbosity,
        reassemble_threshold=sys.newtonReassembleThreshold,
    )
    assemble, solve = make_pb_assemble_solve(ctx)
    from ..utils.hoist import select_jit
    return newton_solve(
        make_pb_residual(ctx), None, u0, params,
        assemble_fn=assemble, assembled_solve_fn=solve,
        jit_fn=select_jit(ctx.vt.num_elements))

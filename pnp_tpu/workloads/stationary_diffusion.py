"""Stationary diffusion / Debye-Hueckel workload (linear solve only).

Parity: reference ``stationary_diffusion`` (src/stationary_diffusion.hh:7-102)
— P1 space, component-0 (coulomb) BC table, pure Laplace operator with
scalar Neumann fluxes (src/diff_operator.hh:95-101, no axisymmetric factor),
single ``StationaryLinearProblemSolver`` apply at tolerance 1e-10, then VTK
+ gnuplot output. The reference instantiates BCExtension without a PB field
(its fallback path cannot compile there); the interior initial values here
are 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Sysparams
from ..fem import assembly as FA
from ..fem.space import FunctionSpace
from ..operators import volume as V
from ..solvers.linear_problem import make_krylov_solver
from .common import make_scalar_context


def run_stationary_diffusion(sys: Sysparams, space: FunctionSpace,
                             reduction: float = 1e-10,
                             output_dir: Optional[str] = None):
    """Returns the solved scalar field u (ndof,)."""
    # DiffOperator carries no axisymmetric factor (src/diff_operator.hh);
    # its boundary flux term likewise (":150-157")
    ctx = make_scalar_context(sys, space, component=0, quad_order=2,
                              flux_cylindrical=False)
    A_el = V.laplace_jacobian_el(ctx.vt)
    op = FA.make_constrained_operator(A_el, ctx.dofmap, ctx.ndof, ctx.free)
    diag = FA.constrained_diagonal(A_el, ctx.dofmap, ctx.ndof, ctx.free)
    amg_ctx = None
    if sys.linearSolver == "CG_AMG_SSOR":
        from ..solvers.amg import make_amg_context
        amg_ctx = make_amg_context(ctx.dofmap, ctx.ndof, ctx.free,
                                   dof_coords=ctx.space.dof_coords)
    krylov = make_krylov_solver(sys.linearSolver, sys.linearSolverIterations,
                                amg_ctx=amg_ctx)

    if sys.printStiffnessMatrix:
        # reference flag exists but its Dune::printmatrix call is commented
        # out (src/stationary_pnp_from_pb.hh:322); here it works: dump the
        # assembled constrained dense matrix alongside the outputs
        from ..fem.assembly import dense_constrained_matrix
        A = dense_constrained_matrix(A_el, ctx.dofmap, ctx.ndof, ctx.free)
        np.save("stiffness_matrix.npy", np.asarray(A))

    u0 = jnp.where(ctx.free, 0.0, ctx.dirichlet)

    @jax.jit
    def solve(u):
        r_el = V.laplace_residual_el(u[ctx.dofmap], ctx.vt)
        r = ctx.constrain(ctx.scatter(r_el) + ctx.flux_vector)
        res = krylov(op, r, jnp.zeros_like(r), diag, reduction, A_el=A_el)
        return u - res.x, res

    u, res = solve(u0)
    if output_dir:
        import os
        from ..io.writers import write_dat, write_vtu
        os.makedirs(output_dir, exist_ok=True)
        write_dat(space, u, os.path.join(output_dir, "solution.dat.dat"))
        write_vtu(space, {"solution": np.asarray(u)},
                  os.path.join(output_dir, "yeah.vtu"))
    return u, res

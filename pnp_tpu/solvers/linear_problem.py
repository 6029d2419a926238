"""Stationary linear problem solver + Krylov backend selection.

TPU-native replacement for PDELab's ``StationaryLinearProblemSolver``
(bound by the reference at src/instationary_pnp_from_pb_md.hh:349-350,
383-386): assemble the residual at the current iterate, solve the
correction system ``J z = r`` with homogeneous Dirichlet constraints, and
update ``u <- u - z``. For a linear operator this converges in one apply,
but like the reference it tolerates warm starts / repeated applies.

``make_krylov_solver`` maps the reference's five compile-time linear-solver
variants (src/instationary_pnp_from_pb_md.hh:20-32) to runtime-selected
TPU-native equivalents (see solvers/precond.py for the SSOR/AMG mapping).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from .krylov import cg, bicgstab
from .precond import (
    identity_precond, jacobi_precond, chebyshev_jacobi_precond,
    estimate_dinv_spectral_radius,
)

Array = Any


def make_krylov_solver(name: str, maxiter: int, ssor_k: int = 3):
    """Return solve(op, b, x0, diag, reduction) -> KrylovResult for a variant.

    Variants (reference compile-time LINEARSOLVER 1..5):
      BCGS_SSORk  -> BiCGSTAB + Chebyshev-Jacobi(k)
      BCGS_NOPREC -> BiCGSTAB
      CG_NOPREC   -> CG
      CG_Jacobi   -> CG + Jacobi
      CG_AMG_SSOR -> CG + two-level aggregation AMG (solvers/amg.py)
    """
    if name == "BCGS_NOPREC":
        def solve(op, b, x0, diag, reduction):
            return bicgstab(op, b, x0, None, reduction, maxiter)
    elif name == "CG_NOPREC":
        def solve(op, b, x0, diag, reduction):
            return cg(op, b, x0, None, reduction, maxiter)
    elif name == "CG_Jacobi":
        def solve(op, b, x0, diag, reduction):
            return cg(op, b, x0, jacobi_precond(diag), reduction, maxiter)
    elif name == "BCGS_SSORk":
        def solve(op, b, x0, diag, reduction):
            lam = estimate_dinv_spectral_radius(op, diag, b + 1e-30)
            M = chebyshev_jacobi_precond(op, diag, lam, degree=ssor_k)
            return bicgstab(op, b, x0, M, reduction, maxiter)
    elif name == "CG_AMG_SSOR":
        from .amg import two_level_precond_from_context
        def solve(op, b, x0, diag, reduction, amg_ctx=None):
            if amg_ctx is not None:
                M = two_level_precond_from_context(op, diag, amg_ctx)
            else:
                lam = estimate_dinv_spectral_radius(op, diag, b + 1e-30)
                M = chebyshev_jacobi_precond(op, diag, lam, degree=ssor_k)
            return cg(op, b, x0, M, reduction, maxiter)
    else:
        raise ValueError(f"unknown linear solver variant '{name}'")
    return solve


def stationary_linear_solve(
    residual_fn: Callable[[Array], Array],
    operator_fn: Callable[[Array], Array],
    diag: Array,
    u: Array,
    krylov_solve,
    reduction: float = 1e-10,
):
    """One PDELab-style SLP apply: r = residual(u); J z = r; u -= z."""
    r = residual_fn(u)
    res = krylov_solve(operator_fn, r, jnp.zeros_like(u), diag, reduction)
    return u - res.x, res

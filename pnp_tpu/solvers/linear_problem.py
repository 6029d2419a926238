"""Stationary linear problem solver + Krylov backend selection.

TPU-native replacement for PDELab's ``StationaryLinearProblemSolver``
(bound by the reference at src/instationary_pnp_from_pb_md.hh:349-350,
383-386): assemble the residual at the current iterate, solve the
correction system ``J z = r`` with homogeneous Dirichlet constraints, and
update ``u <- u - z``. For a linear operator this converges in one apply,
but like the reference it tolerates warm starts / repeated applies.

``make_krylov_solver`` maps the reference's five compile-time linear-solver
variants (src/instationary_pnp_from_pb_md.hh:20-32) to runtime-selected
TPU-native equivalents (see solvers/precond.py for the SSOR mapping and
solvers/amg.py for the AMG-class two-level scheme).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp

from .krylov import cg, bicgstab
from .precond import (
    identity_precond, jacobi_precond, chebyshev_jacobi_precond,
    estimate_dinv_spectral_radius,
)

Array = Any


def make_krylov_solver(name: str, maxiter: int, ssor_k: int = 3,
                       amg_ctx=None):
    """Return ``solve(op, b, x0, diag, reduction, A_el=None)`` for a variant.

    Variants (reference compile-time LINEARSOLVER 1..5):
      BCGS_SSORk  -> BiCGSTAB + Chebyshev-Jacobi(k)
      BCGS_NOPREC -> BiCGSTAB
      CG_NOPREC   -> CG
      CG_Jacobi   -> CG + Jacobi
      CG_AMG_SSOR -> CG + two-level aggregation AMG (needs ``amg_ctx`` and
                     the element Jacobian blocks ``A_el``; falls back to
                     Chebyshev-Jacobi otherwise)
    """
    if name == "BCGS_NOPREC":
        def solve(op, b, x0, diag, reduction, A_el=None, lam=None):
            return bicgstab(op, b, x0, None, reduction, maxiter)
    elif name == "CG_NOPREC":
        def solve(op, b, x0, diag, reduction, A_el=None, lam=None):
            return cg(op, b, x0, None, reduction, maxiter)
    elif name == "CG_Jacobi":
        def solve(op, b, x0, diag, reduction, A_el=None, lam=None):
            return cg(op, b, x0, jacobi_precond(diag), reduction, maxiter)
    elif name == "BCGS_Jacobi":
        # rebuild-only variant: diagonal preconditioning is spectrum-shape
        # agnostic, the right default for strongly nonsymmetric coupled
        # Jacobians where the SPD Chebyshev interval assumption breaks
        def solve(op, b, x0, diag, reduction, A_el=None, lam=None):
            return bicgstab(op, b, x0, jacobi_precond(diag), reduction, maxiter)
    elif name == "BCGS_SSORk":
        def solve(op, b, x0, diag, reduction, A_el=None, lam=None):
            # lam: pass a precomputed lambda_max(D^-1 A) estimate to skip
            # the power iteration (cuts 12 SpMVs out of the program; the
            # estimate is stable across Newton/time steps)
            if lam is None:
                lam = estimate_dinv_spectral_radius(op, diag, b + 1e-30)
            M = chebyshev_jacobi_precond(op, diag, lam, degree=ssor_k)
            return bicgstab(op, b, x0, M, reduction, maxiter)
    elif name == "CG_AMG_SSOR":
        from .amg import two_level_precond

        def solve(op, b, x0, diag, reduction, A_el=None, lam=None):
            if amg_ctx is not None and A_el is not None:
                M = two_level_precond(A_el, amg_ctx, diag)
            else:
                if lam is None:
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
    A_el=None,
):
    """One PDELab-style SLP apply: r = residual(u); J z = r; u -= z."""
    r = residual_fn(u)
    res = krylov_solve(operator_fn, r, jnp.zeros_like(u), diag, reduction,
                       A_el=A_el)
    return u - res.x, res

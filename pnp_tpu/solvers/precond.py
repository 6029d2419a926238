"""Preconditioners without sequential triangular sweeps.

The reference's five compile-time solver variants use ISTL's SSOR(k), Jacobi
and AMG preconditioners (src/instationary_pnp_from_pb_md.hh:188-211). SSOR's
forward/backward triangular solves are inherently sequential — poison for a
TPU — so the SSOR(k)-class option here is a Chebyshev-accelerated Jacobi
polynomial smoother of degree k: SPD, matrix-free, and built from the same
diagonal. The AMG-class option is a two-level aggregation scheme in
``pnp_tpu.solvers.amg``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

Array = Any
Op = Callable[[Array], Array]


def identity_precond() -> Op:
    return lambda r: r


def jacobi_precond(diag: Array) -> Op:
    """M^-1 r = r / diag (constrained rows must carry diag = 1)."""
    inv = 1.0 / diag
    return lambda r: r * inv


def estimate_dinv_spectral_radius(op: Op, diag: Array, probe: Array,
                                  iters: int = 12) -> Array:
    """Power-iteration estimate of lambda_max(D^-1 A) (host/setup-time)."""
    inv = 1.0 / diag
    v = probe / jnp.linalg.norm(probe)
    lam = jnp.asarray(1.0)
    for _ in range(iters):
        w = inv * op(v)
        lam = jnp.linalg.norm(w)
        v = w / jnp.maximum(lam, 1e-300)
    return lam


def chebyshev_jacobi_precond(op: Op, diag: Array, lam_max: Array,
                             degree: int = 3, lam_min_frac: float = 0.06) -> Op:
    """Degree-k Chebyshev polynomial in D^-1 A over [lam_min, lam_max].

    A fixed polynomial preconditioner (SPD for SPD A), the parallel stand-in
    for ISTL's SSOR(k). ``lam_max`` should slightly overestimate the top
    eigenvalue of D^-1 A; ``lam_min_frac * lam_max`` bounds the targeted
    low end (standard smoother choice).
    """
    inv = 1.0 / diag
    lmax = 1.1 * lam_max
    lmin = lam_min_frac * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    def M(r: Array) -> Array:
        # Chebyshev semi-iteration for A z = r with z0 = 0, D-scaled
        d = (inv * r) / theta
        z = d
        rho = 1.0 / sigma
        for _ in range(degree - 1):
            resid = r - op(z)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * (inv * resid)
            z = z + d
            rho = rho_new
        return z

    return M

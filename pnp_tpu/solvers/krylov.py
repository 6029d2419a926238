"""Matrix-free Krylov solvers as ``lax.while_loop`` programs.

TPU-native replacement for DUNE-ISTL's NOVLP CG/BiCGSTAB backends (bound by
the reference at src/instationary_pnp_from_pb_md.hh:188-211). The operator
is any callable x -> A x (typically element-block SpMV from
``fem.assembly``); in multi-device mode the SpMV already psums its scatter,
so dot products here are local (vectors are replicated per the additive
NOVLP convention).

Termination matches ISTL semantics: relative defect reduction
``||r|| <= reduction * ||r0||`` or iteration cap. All math is f64.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

Array = Any
Op = Callable[[Array], Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KrylovResult:
    x: Any
    iterations: Any
    relres: Any
    converged: Any


def _norm(x):
    return jnp.sqrt(jnp.dot(x, x))


def cg(op: Op, b: Array, x0: Array, precond: Op | None = None,
       reduction: float = 1e-8, maxiter: int = 5000) -> KrylovResult:
    """Preconditioned conjugate gradients (SPD operator + preconditioner)."""
    M = precond if precond is not None else (lambda r: r)
    r0 = b - op(x0)
    z0 = M(r0)
    norm0 = _norm(r0)
    tol = reduction * jnp.maximum(norm0, 1e-300)

    def cond(state):
        _, r, _, _, k, _ = state
        return (_norm(r) > tol) & (k < maxiter)

    def body(state):
        x, r, z, p, k, rz = state
        Ap = op(p)
        pAp = jnp.dot(p, Ap)
        alpha = rz / jnp.where(pAp == 0.0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.where(rz == 0.0, 1.0, rz)
        p = z + beta * p
        return (x, r, z, p, k + 1, rz_new)

    init = (x0, r0, z0, z0, jnp.int32(0), jnp.dot(r0, z0))
    x, r, _, _, k, _ = jax.lax.while_loop(cond, body, init)
    relres = _norm(r) / jnp.maximum(norm0, 1e-300)
    return KrylovResult(x=x, iterations=k, relres=relres, converged=relres <= reduction)


def bicgstab(op: Op, b: Array, x0: Array, precond: Op | None = None,
             reduction: float = 1e-8, maxiter: int = 5000) -> KrylovResult:
    """Preconditioned BiCGSTAB (van der Vorst), right-preconditioned form."""
    M = precond if precond is not None else (lambda r: r)
    r0 = b - op(x0)
    norm0 = _norm(r0)
    tol = reduction * jnp.maximum(norm0, 1e-300)
    rhat = r0

    def cond(state):
        x, r, p, v, rho, alpha, omega, k = state
        return (_norm(r) > tol) & (k < maxiter)

    def body(state):
        x, r, p, v, rho, alpha, omega, k = state
        rho_new = jnp.dot(rhat, r)
        beta = (rho_new / jnp.where(rho == 0.0, 1.0, rho)) * (
            alpha / jnp.where(omega == 0.0, 1.0, omega))
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = op(phat)
        rv = jnp.dot(rhat, v)
        alpha = rho_new / jnp.where(rv == 0.0, 1.0, rv)
        s = r - alpha * v
        shat = M(s)
        t = op(shat)
        tt = jnp.dot(t, t)
        omega = jnp.dot(t, s) / jnp.where(tt == 0.0, 1.0, tt)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega, k + 1)

    zeros = jnp.zeros_like(b)
    init = (x0, r0, zeros, zeros, jnp.float64(1.0), jnp.float64(1.0),
            jnp.float64(1.0), jnp.int32(0))
    x, r, _, _, _, _, _, k = jax.lax.while_loop(cond, body, init)
    relres = _norm(r) / jnp.maximum(norm0, 1e-300)
    return KrylovResult(x=x, iterations=k, relres=relres, converged=relres <= reduction)

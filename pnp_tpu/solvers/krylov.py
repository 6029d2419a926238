"""Matrix-free Krylov solvers as ``lax.while_loop`` programs.

TPU-native replacement for DUNE-ISTL's NOVLP CG/BiCGSTAB backends (bound by
the reference at src/instationary_pnp_from_pb_md.hh:188-211). The operator
is any callable x -> A x (typically element-block SpMV from
``fem.assembly``); in multi-device mode the SpMV already psums its scatter,
so dot products here are local (vectors are replicated per the additive
NOVLP convention).

BATCHED SYSTEMS: vectors may be (S, N) — S independent systems advanced in
one loop (dots reduce over the last axis, scalars broadcast per system, and
the loop runs until every system converges). This matters on TPU, where
each op inside a while_loop body costs ~0.3 ms latency regardless of size:
stacking the c+/c- stage solves halves the per-step latency
(tests/test_solvers.py::test_batched_* verify parity with per-system runs).

Termination matches ISTL semantics: relative defect reduction
``||r|| <= reduction * ||r0||`` (per system) or iteration cap.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

Array = Any
Op = Callable[[Array], Array]


def f32_inner_enabled() -> bool:
    """f32 Krylov vectors on TPU block-RAS/Schwarz paths (TPU DEFAULT
    since r4; PNP_TPU_KRYLOV32=0 disables).

    f64 vector ops are EMULATED on TPU: the L3 (185k-dof) profile
    measured the f64 element-operator apply at 164 ms vs 21 ms for the
    true-f32 operator, RAS applies 25.6 vs 7.3 ms, and two-level
    BiCGSTAB 159.8 -> 80.7 ms per iteration
    (tools/results_tpu_l3_profile_r4.log); e2e at 11,839/46,653 nodes in
    tools/results_tpu_scaled_e2e_r4.log. Callers keep correctness via
    f64-exact outer residuals (Poisson pass loop / Newton defects);
    inner tolerances are >= 1e-5 where f32 norms carry ~1e-7 accuracy.
    """
    import os
    return (os.environ.get("PNP_TPU_KRYLOV32") != "0"
            and jax.default_backend() == "tpu")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KrylovResult:
    x: Any
    iterations: Any
    relres: Any          # (…,) per-system relative residual
    converged: Any


def _norm(x):
    # f64 ACCUMULATION regardless of vector dtype: f32 reductions over
    # 10^5-entry vectors carry enough cancellation error to stagnate the
    # BiCGSTAB recurrence (measured: a cold 46k Poisson pass burned a
    # 256-iteration budget with f32 dots). Products round in the vector
    # dtype; only the sum runs f64; the scalar returns in vector dtype so
    # the loop carry stays f32 on the f32-inner path.
    s = jnp.sum((x * x).astype(jnp.float64), axis=-1, keepdims=True)
    return jnp.sqrt(s).astype(x.dtype)


def _dot(a, b):
    return jnp.sum((a * b).astype(jnp.float64), axis=-1,
                   keepdims=True).astype(a.dtype)


def _nz(x):
    return jnp.where(x == 0.0, 1.0, x)


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
        return jnp.any(_norm(r) > tol) & (k < maxiter)

    def body(state):
        x, r, z, p, k, rz = state
        Ap = op(p)
        alpha = rz / _nz(_dot(p, Ap))
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        beta = rz_new / _nz(rz)
        p = z + beta * p
        return (x, r, z, p, k + 1, rz_new)

    init = (x0, r0, z0, z0, jnp.int32(0), _dot(r0, z0))
    x, r, _, _, k, _ = jax.lax.while_loop(cond, body, init)
    relres = (_norm(r) / jnp.maximum(norm0, 1e-300))[..., 0]
    return KrylovResult(x=x, iterations=k, relres=relres,
                        converged=jnp.all(relres <= reduction))


def bicgstab(op: Op, b: Array, x0: Array, precond: Op | None = None,
             reduction: float = 1e-8, maxiter: int = 5000) -> KrylovResult:
    """Preconditioned BiCGSTAB (van der Vorst), right-preconditioned form."""
    M = precond if precond is not None else (lambda r: r)
    r0 = b - op(x0)
    norm0 = _norm(r0)
    tol = reduction * jnp.maximum(norm0, 1e-300)
    rhat = r0
    one = jnp.ones_like(norm0)

    def cond(state):
        x, r, p, v, rho, alpha, omega, k = state
        return jnp.any(_norm(r) > tol) & (k < maxiter)

    def body(state):
        x, r, p, v, rho, alpha, omega, k = state
        rho_new = _dot(rhat, r)
        beta = (rho_new / _nz(rho)) * (alpha / _nz(omega))
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = op(phat)
        alpha = rho_new / _nz(_dot(rhat, v))
        s = r - alpha * v
        shat = M(s)
        t = op(shat)
        omega = _dot(t, s) / _nz(_dot(t, t))
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega, k + 1)

    zeros = jnp.zeros_like(b)
    init = (x0, r0, zeros, zeros, one, one, one, jnp.int32(0))
    x, r, _, _, _, _, _, k = jax.lax.while_loop(cond, body, init)
    relres = (_norm(r) / jnp.maximum(norm0, 1e-300))[..., 0]
    return KrylovResult(x=x, iterations=k, relres=relres,
                        converged=jnp.all(relres <= reduction))

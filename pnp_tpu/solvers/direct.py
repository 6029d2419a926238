"""Batched dense direct solves: f32 LU on the MXU + f64 refinement.

The advection-dominated species stage systems (M + alpha dt K(phi) with
Peclet >> 1 under the pore bias) defeat diagonal/polynomial-preconditioned
Krylov — the reference budgets 20,000 SSOR-preconditioned BiCGSTAB
iterations for them (test/pore_pnp/pore.cfg:6), and sequential SSOR sweeps
don't exist on a TPU. The TPU-native replacement for that robustness:
factorize the stage matrices DENSELY in f32 (XLA TPU implements LU for f32
only) on the MXU — dense factorization is the hardware's native food — and
recover f64-grade accuracy with iterative refinement against the exact
element-block operator:

    x_{k+1} = x_k + (P L U)^-1_f32 (b - A_f64 x_k)

Each refinement contraction reduces the error by ~kappa(A) * eps_f32, so a
handful of triangular solves reaches the 1e-5/1e-10 stage tolerances.
One factorization serves every DIRK stage of a step when the tableau has
uniform diagonal coefficients (Alexander2 does).

Memory: S * ndof^2 * (8 + 4) bytes — callers gate on ndof.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..fem import assembly as FA

Array = Any


def batched_lu_factor_f32(A_dense: Array):
    """(S, N, N) f64 -> f32 LU factors (vmapped lapack-style getrf)."""
    return jax.vmap(jax.scipy.linalg.lu_factor)(A_dense.astype(jnp.float32))


def use_pallas_inverse() -> bool:
    """Pallas blocked Gauss-Jordan for the FLAGSHIP dense stage inverses
    (opt-in: PNP_TPU_PALLAS_INV=1) — **DECLINED as a default by the r3
    e2e gate** (tools/results_tpu_pallas_e2e_r3.log): on the 120-step
    pore transient the XLA-inverse path stays finite (51.7 ms fused
    step) while the Pallas path went NON-FINITE by step 11 even with
    in-block partial pivoting, equilibration, and the contraction-probe
    guard (the probe's smooth test vector passes matrices whose
    refinement still diverges on rough residuals — cross-block pivot
    growth on the advective stage matrices, cf. tools/gj_pivot_study.py).

    Where the kernel IS the hardware-proven default (r3 production runs):
      * the small-block RAS local factorizations
        (solvers/block_ras.py / schwarz.py, prefer_pallas=True) — 2-4
        panel blocks per matrix, probed + cond-guarded; and
      * the very-large equilibrated CONSTANT-Poisson inverse
        (inv_f32_setup_large) — SPD, 365 panel blocks, contraction
        3e-9 per 2 passes at 46,653 dofs.
    The failure mode is specific to LARGE ADVECTIVE dense matrices.
    """
    import os
    return (os.environ.get("PNP_TPU_PALLAS_INV") == "1"
            and jax.default_backend() == "tpu")


def _xla_inv_f32(A32: Array):
    # true-f32 internal matmuls: the TPU default (bf16 passes) would make
    # the inverse itself the accuracy bottleneck of the refinement loop
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.inv(A32)


def batched_inv_f32(A_dense: Array, prefer_pallas: bool = False):
    """(S, N, N) -> f32 explicit inverses.

    ``prefer_pallas``: call-site policy switch — take the guarded Pallas
    path on TPU without the env opt-in. Used by the block-RAS local
    factorization (solvers/block_ras.py), whose shift-regularized
    subdomain matrices are the shape where the Pallas kernel measured
    2.3x faster than XLA (41.8 -> 18.3 ms at (94, 512)); the contraction
    probe below still guards every call.

    Measured on the TPU at N=3048: inversion costs ~1.5x an LU
    factorization, but each preconditioner APPLY becomes one MXU matvec
    (~2.5 ms) instead of a latency-bound batched triangular-solve pair
    (~10.7 ms) — a net win whenever a factorization serves >=2 applies,
    which every refinement-based stage solve does.

    On TPU hardware the inverse runs as the Pallas blocked Gauss-Jordan
    (operators/pallas_kernels.py:batched_inverse_pallas, in-block partial
    pivoting) with a cheap runtime guard: a probe matvec checks
    ||A (X b) - b|| for finiteness and preconditioner-grade accuracy, and
    ``lax.cond`` falls back to the XLA inverse when the probe fails (the
    fallback branch executes only when taken). Every call site is a
    PRECONDITIONER (the dense stage path refines against exact f64
    residuals; block-RAS only preconditions BiCGSTAB), so inverse quality
    only sets contraction rates — the guard exists to exclude the
    non-finite corner, not to certify accuracy.
    """
    A32 = A_dense.astype(jnp.float32)
    take_pallas = use_pallas_inverse() or (
        prefer_pallas and jax.default_backend() == "tpu"
        and __import__("os").environ.get("PNP_TPU_PALLAS_INV") != "0")
    if not take_pallas:
        return _xla_inv_f32(A32)
    X, ok = _pallas_inv_probe(A32)
    return jax.lax.cond(ok, lambda: X, lambda: _xla_inv_f32(A32))


def probe_vectors(n: int, batch_shape=()):
    """The contraction probe's test-vector set: (2, *batch, n) f32.

    SMOOTH (all-ones) plus ROUGH (alternating +-1, high-frequency in the
    Morton/dof order hence spatially rough): the r3 flagship Pallas
    decline showed matrices whose refinement contracts on smooth vectors
    but diverges on rough residuals (VERDICT r3 item 8) — a smooth-only
    probe has a documented blind spot exactly where refinement loops
    spend their time (residuals are rough after the smooth error is
    gone). Both vectors must contract for the probe to pass.
    """
    smooth = jnp.ones(batch_shape + (n,), jnp.float32)
    rough = jnp.where(jnp.arange(n) % 2 == 0, 1.0, -1.0).astype(jnp.float32)
    rough = jnp.broadcast_to(rough, batch_shape + (n,))
    return jnp.stack([smooth, rough])


def contraction_ok(A32: Array, X: Array):
    """Two-step refinement contraction verdict for an (S, N, N) inverse.

    The acceptance criterion is the CONTRACTION of a refinement probe,
    not the raw inverse residual (on the late-transient advective stage
    matrices even LAPACK's pivoted f32 inverse has O(1) elementwise
    ||XA - I|| entries — what matters is that x <- x + X (b - A x) still
    converges). Two refinement steps on b = A v for BOTH probe vectors
    (:func:`probe_vectors` — smooth + rough) must cut the residual to
    <= 0.25 ||b||; ~10 matvecs, O(S N^2) — noise next to the
    O(S N^3 / B) inversion itself. Norms are PER MATRIX AND PER VECTOR:
    one diverging subdomain among S must not hide under an aggregate
    norm (a finite but diverging preconditioner saturates the refinement
    loop downstream — the exact corner the guard exists to exclude).
    """
    hi = jax.lax.Precision.HIGHEST
    mv = lambda M, v: jnp.einsum("sij,psj->psi", M, v, precision=hi)
    b = mv(A32, probe_vectors(A32.shape[-1], A32.shape[:1]))   # (2, S, N)
    x1 = mv(X, b)
    r1 = b - mv(A32, x1)
    r2 = r1 - mv(A32, mv(X, r1))
    nb = jnp.linalg.norm(b, axis=-1)                     # (2, S)
    nr2 = jnp.linalg.norm(r2, axis=-1)
    return (jnp.all(jnp.isfinite(nr2)) & jnp.all(nr2 <= 0.25 * nb)
            & jnp.all(jnp.isfinite(X)))


def _pallas_inv_probe(A32: Array):
    """Pallas blocked-GJ inverses + contraction-probe verdict
    (:func:`contraction_ok` — smooth AND rough probe vectors)."""
    from ..operators.pallas_kernels import batched_inverse_pallas
    X = batched_inverse_pallas(A32)
    return X, contraction_ok(A32, X)


def scaled_inv_apply(Ainv, rk: Array) -> Array:
    """Preconditioner apply for a plain or (X_eq, s) scaled inverse.

    Plain: d = X rk. Scaled (the very-large-N tier, where the inverse is
    computed on the pre-equilibrated matrix A_eq = S A S and never
    unscaled to avoid an extra ndof^2 buffer): d = S (X_eq (S rk)).
    Output in rk's dtype.
    """
    hi = jax.lax.Precision.HIGHEST
    if isinstance(Ainv, tuple):
        X_eq, s = Ainv
        Np = X_eq.shape[-1]
        n = rk.shape[-1]
        v = (rk * s[:n]).astype(jnp.float32)
        if Np != n:
            # the very-large tier keeps its inverse at the 128-padded size
            # (identity on pad rows) so the Pallas GJ never re-pads the
            # 8 GB buffer; pad/crop the small vectors instead
            v = jnp.pad(v, ((0, 0), (0, Np - n)))
        # DEFAULT precision (bf16 passes) on purpose: the equilibrated
        # Poisson inverse contracts ~5e-5/pass at 46k — orders of
        # magnitude more headroom than the 1e-10 target needs — and the
        # TPU A/B measured identical refinement counts (k=4) with a
        # strictly cheaper apply (tools log r3). The plain branch below
        # keeps HIGHEST: the advective species inverses have no such
        # headroom (default multiplied refinement 2 -> 10, CLAUDE.md r1).
        d = jnp.einsum("sij,sj->si", X_eq, v)
        return (d[:, :n] * s[:n]).astype(rk.dtype)
    d = jnp.einsum("sij,sj->si", Ainv, rk.astype(jnp.float32), precision=hi)
    return d.astype(rk.dtype)


def inv_f32_setup_large(A_eq32: Array, s32: Array, op_probe, n: int):
    """Very-large-N setup inverse: donated pre-equilibrated input +
    element-operator probe.

    At 46k dofs the dense f32 matrix is 8.7 GB — holding BOTH A and its
    inverse (or an equilibrated copy) exceeds the v5e's 16 GB HBM, so the
    caller assembles the equilibrated matrix A_eq = S A S DIRECTLY from
    scaled element blocks (one buffer), this donates it into the Pallas
    blocked-GJ (in place via input_output_aliases), and the contraction
    probe checks x <- x + S X_eq S (b - A x) against the matrix-free
    ELEMENT operator ``op_probe`` (batched, constrained, f64) instead of
    the dense A. Returns (X_eq, ok) with ok fetched host-side; on
    probe/compile failure the caller keeps its iterative path (no host
    inversion at this scale — LAPACK would take ~an hour at 46k here).
    The unscaling S (...) S stays folded into every apply
    (:func:`scaled_inv_apply`) — materializing the unscaled inverse would
    cost another ndof^2 buffer.
    """
    from ..operators.pallas_kernels import batched_inverse_pallas

    assert A_eq32.shape[0] == 1, "very-large tier: one matrix per call"

    def build(a):
        X_eq = batched_inverse_pallas(a, equilibrate=False)

        def contracts(v):
            """Two refinement steps on b = A v must reach 0.25 ||b||."""
            b = op_probe(v[None])
            x1 = scaled_inv_apply((X_eq, s32), b)
            r1 = b - op_probe(x1)
            x2 = x1 + scaled_inv_apply((X_eq, s32), r1)
            r2 = b - op_probe(x2)
            nb = jnp.linalg.norm(b, axis=-1)
            nr2 = jnp.linalg.norm(r2, axis=-1)
            return jnp.all(jnp.isfinite(nr2)) & jnp.all(nr2 <= 0.25 * nb)

        # smooth + rough probe vectors (VERDICT r3 item 8): rough
        # residuals are where the smooth-only probe had its documented
        # blind spot; both must contract
        vs = probe_vectors(n).astype(jnp.float64)          # (2, n)
        ok = contracts(vs[0]) & contracts(vs[1]) & jnp.all(jnp.isfinite(X_eq))
        return X_eq, ok

    try:
        # the kernel's two (128, Np) f32 row buffers exceed the DEFAULT
        # 16 MB scoped-vmem limit above ~16k dofs (45.7 MB at 46,720);
        # physical VMEM is 128 MB — raise the limit per-compile (the
        # remote compile service forwards proto-backed XLA flags)
        compiled = jax.jit(build, donate_argnums=0).lower(A_eq32).compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"})
        X_eq, ok = compiled(A_eq32)
        return X_eq, bool(ok)
    except Exception as e:  # Mosaic compile/HBM failure — caller falls back
        import sys
        print(f"[pnp_tpu] very-large inverse tier disabled: "
              f"{str(e)[:300]}", file=sys.stderr, flush=True)
        return None, False


def inv_f32_setup(A_dense: Array):
    """Setup-time batched f32 inverse with HOST-dispatched fallback.

    Returns the (S, N, N) f32 inverse, or ``None`` when even the
    host-LAPACK fallback fails the contraction probe (the caller keeps
    its iterative path — see workloads/instationary_pnp_from_pb.py).

    For one-time factorizations of CONSTANT operators (the mid-size
    Poisson tier, workloads/instationary_pnp_from_pb.py). Unlike
    :func:`batched_inv_f32`, whose ``lax.cond`` compiles the XLA-inverse
    fallback into the same program — fine at RAS-block sizes, but the XLA
    f32 LU blows the v5e's 16 MB scoped-vmem limit above ~8k dofs
    (BENCH_r02.json tail / VERDICT r2 item 1) — this runs the Pallas
    inverse + contraction probe as its own program, fetches the scalar
    verdict to host, and only on probe/compile failure computes the
    inverse HOST-SIDE with LAPACK (f64, cast to f32). No large-N XLA LU
    is ever compiled. Setup-time only: the host sync (and the worst-case
    host inversion) are one-time costs, never per-step.
    """
    A32 = jnp.asarray(A_dense, jnp.float32)
    if jax.default_backend() == "tpu":
        try:
            X, ok = jax.jit(_pallas_inv_probe)(A32)
            if bool(ok):
                return X
        except Exception:  # Mosaic compile/vmem failure at extreme N
            pass
        import numpy as np
        X_host = np.linalg.inv(np.asarray(A32, np.float64)).astype(np.float32)
        # probe the host inverse too (ADVICE r3): a pathologically
        # conditioned operator would otherwise yield an unprobed inverse
        # whose downstream refinement exits silently at maxrefine
        A_np = np.asarray(A32, np.float64)
        N = A_np.shape[-1]
        vs = np.stack([np.ones(N), np.where(np.arange(N) % 2 == 0, 1.0,
                                            -1.0)])          # smooth+rough
        X64 = X_host.astype(np.float64)
        b = np.einsum("sij,pj->psi", A_np, vs)
        x1 = np.einsum("sij,psj->psi", X64, b)
        r1 = b - np.einsum("sij,psj->psi", A_np, x1)
        r2 = r1 - np.einsum("sij,psj->psi", A_np,
                            np.einsum("sij,psj->psi", X64, r1))
        nb = np.linalg.norm(b, axis=-1)
        nr2 = np.linalg.norm(r2, axis=-1)
        if not (np.all(np.isfinite(nr2)) and np.all(nr2 <= 0.25 * nb)):
            import sys
            print("[pnp_tpu] inv_f32_setup: host f32 inverse fails the "
                  "contraction probe — inverse tier disabled for this "
                  "operator (caller falls back to the iterative path)",
                  file=sys.stderr, flush=True)
            return None
        return jnp.asarray(X_host)
    return _xla_inv_f32(A32)  # CPU LAPACK: no vmem limits


def make_inv_refine_solver_arg(A_el: Array, dofmap: Array, ndof: int,
                               free: Array, maxrefine: int = 40,
                               residual_mixed: bool = False):
    """Return solve(Ainv, r, reduction) -> (x, n_refinements).

    ``Ainv`` is a RUNTIME ARGUMENT, never a closure constant: the axon
    remote-compile service ships closed-over constants inside the compile
    request, and a large-N inverse (560 MB at 11,839 dofs) trips its
    request-body limit (HTTP 413 — observed killing the r3 mid-size tier
    before this restructure). Same refinement contract as
    :func:`make_lu_refine_solver`: correctness comes from the exact f64
    element-block residual, the inverse only sets the contraction rate.

    ``residual_mixed``: compute refinement residuals through the
    true-f32 (precision=HIGHEST) element operator instead of the
    f64-emulated one. ONLY for stage-tolerance (1e-5) solves: the f32
    residual is ~1e-7-relative-accurate, two decades under the target,
    while f64 SpMV is EMULATED on TPU (the r3 at-scale lesson). Never
    for 1e-10 solves (the Poisson tier keeps f64 residuals).
    """
    if residual_mixed:
        op = FA.make_constrained_operator_mixed(A_el, dofmap, ndof, free)
    else:
        op = FA.make_constrained_operator_batched(A_el, dofmap, ndof, free)

    def apply_m(Ainv, rk):
        # ``Ainv`` may be a plain inverse (apply runs HIGHEST — the TPU
        # default bf16 passes multiplied refinement counts 2 -> 10 on the
        # advective stage matrices, CLAUDE.md r1) or the (X_eq, s) scaled
        # pair of the very-large-N tier, whose apply INTENTIONALLY runs
        # default precision: the SPD equilibrated Poisson inverse
        # contracts ~5e-5/pass, leaving orders of magnitude of headroom
        # (r3 A/B: identical refinement counts). The tuple form must NOT
        # be reused for advective stage inverses, which have no headroom.
        return scaled_inv_apply(Ainv, rk)

    def solve(Ainv: Array, r: Array, reduction: float):
        norm0 = jnp.sqrt(jnp.sum(r * r, axis=-1, keepdims=True))
        tol = reduction * jnp.maximum(norm0, 1e-300)
        # unroll the first refinement unconditionally: at production stage
        # tolerances the loop runs >=1 iteration every step, and each
        # while_loop round-trip pays a latency-bound norm+cond evaluation
        x0 = apply_m(Ainv, r)
        r0 = r - op(x0)
        x1 = x0 + apply_m(Ainv, r0)
        r1 = r - op(x1)

        def cond(state):
            x, rk, k = state
            nk = jnp.sqrt(jnp.sum(rk * rk, axis=-1, keepdims=True))
            diverged = ~jnp.all(jnp.isfinite(nk))
            return (jnp.any(nk > tol) | diverged) & (k < maxrefine)

        def body(state):
            x, rk, k = state
            x = x + apply_m(Ainv, rk)
            rk = r - op(x)
            return (x, rk, k + 1)

        x, rk, k = jax.lax.while_loop(cond, body, (x1, r1, jnp.int32(2)))
        return x, k

    return solve


def make_inv_refine_solver(Ainv, A_el: Array, dofmap: Array, ndof: int,
                           free: Array, maxrefine: int = 40,
                           residual_mixed: bool = False):
    """Closure form of :func:`make_inv_refine_solver_arg` for call sites
    whose ``Ainv`` is small enough to embed (the per-step species factors
    at flagship size, ~74 MB) or is already a traced value."""
    solve = make_inv_refine_solver_arg(A_el, dofmap, ndof, free, maxrefine,
                                       residual_mixed)
    return lambda r, reduction: solve(Ainv, r, reduction)


def make_lu_refine_solver(lu_piv, A_el: Array, dofmap: Array, ndof: int,
                          free: Array, maxrefine: int = 40):
    """Return solve(r, reduction) -> (x, n_refinements).

    ``lu_piv``: f32 LU factors of the batched constrained dense matrices.
    ``A_el``/``free``: the exact f64 element blocks + masks for residuals.
    ``r`` must have zeros on constrained rows (standard correction solve).
    """
    lu, piv = lu_piv
    op = FA.make_constrained_operator_batched(A_el, dofmap, ndof, free)

    def lu_apply(rk):
        d = jax.vmap(jax.scipy.linalg.lu_solve)((lu, piv),
                                                rk.astype(jnp.float32))
        return d.astype(rk.dtype)

    def solve(r: Array, reduction: float):
        norm0 = jnp.sqrt(jnp.sum(r * r, axis=-1, keepdims=True))
        tol = reduction * jnp.maximum(norm0, 1e-300)
        x0 = lu_apply(r)
        r0 = r - op(x0)

        def cond(state):
            x, rk, k = state
            nk = jnp.sqrt(jnp.sum(rk * rk, axis=-1, keepdims=True))
            # a diverging (stale-LU) refinement produces NaN residuals;
            # NaN comparisons are False, which would exit the loop looking
            # "converged" — keep iterating to maxrefine instead so callers
            # see the saturated count and refactorize
            diverged = ~jnp.all(jnp.isfinite(nk))
            return (jnp.any(nk > tol) | diverged) & (k < maxrefine)

        def body(state):
            x, rk, k = state
            x = x + lu_apply(rk)
            rk = r - op(x)
            return (x, rk, k + 1)

        x, rk, k = jax.lax.while_loop(cond, body, (x0, r0, jnp.int32(1)))
        return x, k

    return solve

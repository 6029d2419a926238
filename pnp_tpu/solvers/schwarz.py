"""Distributed block-LU preconditioner (restricted additive Schwarz).

The TPU-native substitute for sequential SSOR/ILU smoothing inside the
reference's NOVLP Krylov solvers (src/instationary_pnp_from_pb_md.hh:188):
each shard densely assembles the TRUE principal submatrix A[loc, loc] of
its [owned | halo] local dof set (own element blocks + gathered
env-element blocks), factorizes it in f32 on the MXU — batched dense LU
is the hardware's native food — and one preconditioner application is a
single packed halo exchange plus a batched triangular solve pair. With
the halo layer as overlap this is restricted additive Schwarz (RAS) with
exact subdomain solves — the strongest single-level smoother available
without sequential triangular sweeps. RAS is nonsymmetric: pair it with
BiCGSTAB; use ``restricted=False`` (symmetric additive Schwarz) with CG.

Singular floating subdomains (interior shards of a pure-Laplace operator
annihilate constants) are regularized by a relative diagonal shift; the
shift only perturbs the preconditioner, never the Krylov residual.

Memory: S * K * L^2 f32 with L = B_N + B_H (per-shard local size).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Array = Any


def build_local_matrices(ctx, A_el: Array, free: Array,
                         rel_shift: float = 1e-7, env: bool = True) -> Array:
    """Assemble per-shard dense local matrices.

    ctx:   parallel.dist.DistContext.
    A_el:  flat element blocks (K*B_E, n, n) or batched (S, K*B_E, n, n).
    free:  (Kb,) / (S, Kb) boolean masks (False = Dirichlet or padding).
    env:   True (default) assembles the TRUE principal submatrix
           A[loc, loc] by additionally gathering each shard's env-element
           blocks (one setup-time sharded gather; XLA inserts the
           collective). False keeps only the shard's own elements — the
           partial "Neumann" matrix, measured ~2x weaker as a RAS
           preconditioner on a Laplace model problem.
    Returns (K, L, L) / (S, K, L, L) f64 local matrices with identity on
    constrained/padded slots and a ``rel_shift * max|diag|`` shift on free
    diagonals (floating-subdomain regularization).
    """
    squeeze = A_el.ndim == 3
    if squeeze:
        A_el, free = A_el[None], free[None]
    S = A_el.shape[0]
    plan = ctx.plan
    K, B_E, n = plan.K, plan.B_E, ctx.n
    L = plan.B_N + plan.B_H

    f_loc = ctx.local_with_halo(free.astype(A_el.dtype))      # (S, K, L)
    Ar = A_el.reshape(S, K, B_E, n, n)
    dm = ctx.dofmap_local.reshape(K, B_E, n)
    s_ix = jnp.arange(S)[:, None, None, None, None]
    k_ix = jnp.arange(K)[None, :, None, None, None]
    rows = dm[None, :, :, :, None]
    cols = dm[None, :, :, None, :]
    # L+1-wide scratch: slot L is the drop slot for env dofs outside the
    # shard's local set (own-element dofs are always < L).
    A = jnp.zeros((S, K, L + 1, L + 1), dtype=A_el.dtype)
    A = A.at[s_ix, k_ix, rows, cols].add(Ar)
    if env:
        env_ids_np, env_dofmap_np = ctx.env_maps()
        B_E2 = env_ids_np.shape[1]
        env_ids = ctx._pin(jnp.asarray(env_ids_np), 0)
        dme = ctx._pin(jnp.asarray(env_dofmap_np), 0)         # (K, B_E2, n)
        Ae = jnp.take(A_el, env_ids.reshape(-1), axis=1)      # (S,K*B_E2,n,n)
        Ae = Ae.reshape(S, K, B_E2, n, n)
        rows_e = dme[None, :, :, :, None]
        cols_e = dme[None, :, :, None, :]
        A = A.at[s_ix, k_ix, rows_e, cols_e].add(Ae)
    A = ctx._pin(A[:, :, :L, :L], 1)
    A = A * f_loc[:, :, :, None] * f_loc[:, :, None, :]
    diag = jnp.abs(jnp.einsum("skll->skl", A))
    shift = rel_shift * jnp.max(diag, axis=2, keepdims=True)
    bump = (1.0 - f_loc) + shift * f_loc
    A = A + jax.vmap(jax.vmap(jnp.diag))(bump)
    A = ctx._pin(A, 1)
    return A[0] if squeeze else A


def factor_local_matrices(A_loc: Array):
    """f32 LU factors of (…, K, L, L) local matrices (batched getrf)."""
    return jax.lax.linalg.lu(A_loc.astype(jnp.float32))


def _local_spec(mesh, ndim: int, k_axis: int):
    from jax.sharding import PartitionSpec as P
    spec = [None] * ndim
    spec[k_axis] = "e"
    return P(*spec)


def invert_local_matrices(ctx, A_loc: Array) -> Array:
    """Per-shard batched f32 explicit inverses UNDER ``shard_map``.

    The r2 path factorized with XLA LU under GSPMD and applied
    latency-bound triangular-solve pairs (VERDICT r2 item 5 /
    solvers/schwarz.py:88-90 in r2). This is the roadmap replacement:
    each device inverts ITS OWN subdomain matrix inside ``shard_map`` —
    purely local batched math, no collectives inside the mapped function
    (this jax build mis-lowers collectives in shard_map,
    parallel/halo.py:200 — local-only compute is unaffected), so the
    preconditioner apply becomes one MXU matvec per subdomain (measured
    2.5 ms vs 10.7 ms for the triangular pair at the flagship shape,
    solvers/direct.py). On TPU the local inversion prefers the
    hardware-proven Pallas blocked-GJ kernel behind the contraction-probe
    guard (solvers/direct.py:batched_inv_f32).

    A_loc: (K, L, L) or (S, K, L, L) from :func:`build_local_matrices`.
    Returns f32 inverses of the same shape. ICI story: zero — the only
    cross-device traffic of a Schwarz apply is the halo exchange of the
    residual/correction (ctx.local_with_halo), exactly the NOVLP
    smoother locality of DUNE-ISTL.
    """
    squeeze = A_loc.ndim == 3
    if squeeze:
        A_loc = A_loc[None]
    S, K, L, _ = A_loc.shape
    from .direct import batched_inv_f32
    prefer = jax.default_backend() == "tpu"

    def local_inv(a):                       # a: (S, K_loc, L, L) per shard
        Kl = a.shape[1]
        return batched_inv_f32(
            a.reshape(S * Kl, L, L).astype(jnp.float32),
            prefer_pallas=prefer).reshape(S, Kl, L, L)

    if not _shard_map_ok(ctx):
        # eager multi-process setup call: a shard_map output would be a
        # GLOBAL array spanning non-addressable devices, which later jit
        # programs may not close over (DistContext.host_tables mode) —
        # compute replicated-locally instead (identical values)
        inv = local_inv(A_loc)
    else:
        inv = jax.shard_map(local_inv, mesh=ctx.mesh,
                            in_specs=_local_spec(ctx.mesh, 4, 1),
                            out_specs=_local_spec(ctx.mesh, 4, 1))(A_loc)
    return inv[0] if squeeze else inv


def _shard_map_ok(ctx) -> bool:
    """shard_map is safe except when called EAGERLY under multi-process
    host_tables mode (its global output cannot be closed over by jit)."""
    if not getattr(ctx, "host_tables", False):
        return True
    try:  # private API — a jax upgrade renaming it must not ImportError
        from jax._src.core import trace_state_clean
    except ImportError:
        return False  # conservative: replicated-local path (always correct)
    return not trace_state_clean()


def make_ras_inv_precond(ctx, inv: Array, restricted: bool = True):
    """M(r) from explicit local inverses: one halo exchange + one batched
    MXU matvec per subdomain (the matvec runs under ``shard_map`` — local
    contraction only, no collectives inside).

    ``inv``: (K, L, L) / (S, K, L, L) from :func:`invert_local_matrices`.
    Same restriction semantics as :func:`make_ras_precond`.
    """
    plan = ctx.plan
    B_N = plan.B_N
    hi = jax.lax.Precision.HIGHEST

    def precond(r: Array) -> Array:
        rb = r[None] if r.ndim == 1 else r
        r_loc = ctx.local_with_halo(rb).astype(jnp.float32)   # (S, K, L)
        iv = inv[None] if inv.ndim == 3 else inv              # (Si, K, L, L)

        def local_apply(iv_l, rl):
            ivb = jnp.broadcast_to(iv_l, (rl.shape[0],) + iv_l.shape[1:])
            return jnp.einsum("skij,skj->ski", ivb, rl, precision=hi)

        z = jax.shard_map(local_apply, mesh=ctx.mesh,
                          in_specs=(_local_spec(ctx.mesh, 4, 1),
                                    _local_spec(ctx.mesh, 3, 1)),
                          out_specs=_local_spec(ctx.mesh, 3, 1))(iv, r_loc)
        z = z.astype(r.dtype)
        if restricted:
            out = z[:, :, :B_N]
        else:
            out = z[:, :, :B_N] + ctx._backward_b(z[:, :, B_N:])
        out = out.reshape(rb.shape[0], -1)
        return out[0] if r.ndim == 1 else out

    return precond


def make_ras_precond(ctx, lu_out, restricted: bool = True):
    """Return M(r): one halo exchange + batched f32 triangular solves.

    ``lu_out``: (lu, pivots, permutation) from :func:`factor_local_matrices`
    with lu of shape (K, L, L) for flat vectors or (S, K, L, L) for batched
    stacks. ``restricted=True`` keeps only owned rows of the local solves
    (RAS — the better Krylov companion); ``False`` adds halo rows back to
    their owners (symmetric additive Schwarz, usable with CG).
    """
    lu, _, perm = lu_out
    plan = ctx.plan
    B_N = plan.B_N

    def _solve(lu_kll, perm_kll, r_loc):
        # r_loc (K, L) f32; lu (K, L, L); perm (K, L)
        b = jnp.take_along_axis(r_loc, perm_kll, axis=1)
        y = jax.lax.linalg.triangular_solve(
            lu_kll, b[..., None], left_side=True, lower=True,
            unit_diagonal=True)
        z = jax.lax.linalg.triangular_solve(
            lu_kll, y, left_side=True, lower=False)
        return z[..., 0]

    def precond(r: Array) -> Array:
        rb = r[None] if r.ndim == 1 else r
        r_loc = ctx.local_with_halo(rb)                       # (S, K, L)
        r32 = r_loc.astype(jnp.float32)
        if lu.ndim == 3:
            z = jax.vmap(lambda rl: _solve(lu, perm, rl))(r32)
        else:
            z = jax.vmap(_solve)(lu, perm, r32)
        z = z.astype(r.dtype)
        if restricted:
            out = z[:, :, :B_N]
        else:
            out = z[:, :, :B_N] + ctx._backward_b(z[:, :, B_N:])
        out = out.reshape(rb.shape[0], -1)
        return out[0] if r.ndim == 1 else out

    return precond


def make_schwarz_precond(ctx, A_el: Array, free: Array,
                         rel_shift: float = 1e-7, restricted: bool = True,
                         env: bool = True, use_inverse: bool = True):
    """Assemble + factor + return the preconditioner in one call.

    ``use_inverse`` (default): per-shard explicit inverses under
    shard_map (:func:`invert_local_matrices`) — apply is one MXU matvec.
    ``False``: the r2 XLA-LU + triangular-solve path (kept for A/B
    comparison, tools/dist_step_cost.py).
    """
    A_loc = build_local_matrices(ctx, A_el, free, rel_shift, env=env)
    if use_inverse:
        return make_ras_inv_precond(ctx, invert_local_matrices(ctx, A_loc),
                                    restricted)
    return make_ras_precond(ctx, factor_local_matrices(A_loc), restricted)


def build_p1_coarse_dist(ctx, op, free_np, dof_coords):
    """Piecewise-LINEAR per-shard coarse level for the distributed Schwarz.

    The distributed analogue of solvers/block_ras.py:build_p1_coarse
    (VERDICT r3 item 5 — the large-mesh solver tiers never existed on the
    sharded path): 3 coarse dofs per DEVICE subdomain, span{1, x, y} in
    shard-centered/scaled coordinates over the shard's free owned dofs.
    The Galerkin coarse matrix is built through the CONSTRAINED operator
    itself (3K column applies — setup-time only; each apply is one halo
    exchange + SpMV, GSPMD inserts the collectives), so it is exact for
    whatever operator ``op`` applies. Intended for the CONSTANT decoupled
    Poisson operator, factored once per run; the coarse correction
    removes the 1/H iteration growth of one-level Schwarz as shard counts
    rise and mesh sizes grow.

    ``free_np``: HOST (Kb,) bool mask (False = Dirichlet or padding).
    Returns ``(cinv (3K, 3K), W (Kb, 3K))`` for
    :func:`make_two_level_inv_precond`.
    """
    import numpy as np

    plan = ctx.plan
    K, B_N = plan.K, plan.B_N
    og = plan.owned_global                                    # (K, B_N)
    m = og >= 0
    coords = np.zeros((K, B_N, 2))
    coords[m] = np.asarray(dof_coords)[og[m]]
    cnt = np.maximum(m.sum(axis=1), 1)[:, None]
    cent = (coords * m[:, :, None]).sum(axis=1) / cnt          # (K, 2)
    span = np.maximum(
        (np.abs(coords - cent[:, None, :]) * m[:, :, None]).max(axis=1),
        1e-12)                                                 # (K, 2)
    xs = (coords - cent[:, None, :]) / span[:, None, :]
    base3 = np.concatenate([np.ones((K, B_N, 1)), xs], axis=2)  # (K, B_N, 3)
    w = base3 * (m & np.asarray(free_np).reshape(K, B_N))[:, :, None]
    W_np = np.zeros((K, B_N, 3 * K))
    for k in range(K):
        W_np[k, :, 3 * k:3 * k + 3] = w[k]
    W = ctx.put_sharded(W_np.reshape(K * B_N, 3 * K))
    W = jnp.asarray(W)

    @jax.jit
    def _coarse_matrix(W_):
        cols = [op(W_[:, c]) for c in range(3 * K)]            # setup-time
        AW = jnp.stack(cols, axis=1)                           # (Kb, 3K)
        return W_.T @ AW                                       # (3K, 3K)

    Ac = np.asarray(_coarse_matrix(W), np.float64)
    # regularize empty/degenerate modes (all-Dirichlet shards, collinear
    # free dofs) -> identity-ish rows, same policy as build_p1_coarse
    d = np.abs(np.diagonal(Ac))
    scale = d.max() + 1.0
    Ac = Ac + np.diag(np.where(d > 1e-9 * scale, 1e-6 * d, 1.0))
    cinv = np.linalg.inv(Ac)
    return jnp.asarray(cinv), W


def make_two_level_inv_precond(ctx, inv, p1_coarse, op, free,
                               restricted: bool = True):
    """Multiplicative RAS + per-shard-linear coarse correction (FLAT
    vectors — the production user is the distributed Poisson solve).

    z1 = RAS(r); z = z1 + W Ac^-1 W^T (r - A z1). One extra operator
    apply per call (a halo exchange + SpMV); the coarse solve itself is a
    replicated (3K, 3K) matvec — noise. Nonsymmetric: pair with BiCGSTAB.
    """
    ras = make_ras_inv_precond(ctx, inv, restricted)
    cinv, W = p1_coarse

    def precond(r: Array) -> Array:
        z1 = ras(r)
        resid = jnp.where(free, r - op(z1), 0.0)
        rc = resid @ W                                         # (3K,)
        zc = cinv.astype(r.dtype) @ rc.astype(r.dtype)
        z = z1 + jnp.where(free, W.astype(r.dtype) @ zc, 0.0)
        return z

    return precond

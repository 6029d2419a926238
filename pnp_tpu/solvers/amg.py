"""Two-level aggregation AMG preconditioner (the CG_AMG_SSOR-class option).

TPU-native substitute for ISTL's ``CG_AMG_SSOR`` backend (bound by the
reference at src/instationary_pnp_from_pb_md.hh:209-211). Classic AMG's
sequential Gauss-Seidel smoothers and deep unstructured hierarchies map
poorly to a TPU, so this is the standard parallel compromise:

  * unsmoothed greedy aggregation on the dof connectivity graph
    (host-side setup, geometry-independent, reused across Jacobians);
  * Galerkin coarse matrix A_c = P^T A P formed ON DEVICE directly from
    the element blocks with one 2-D scatter-add (no SpMV probing);
  * dense Cholesky coarse solve (coarse space is capped small);
  * symmetric damped-Jacobi pre/post smoothing, keeping M SPD for CG.

This is the "Schur-complement/two-level substitute" the survey prescribes
(SURVEY.md section 7 hard parts).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import assembly as FA

Array = Any


@dataclasses.dataclass(frozen=True)
class AmgContext:
    """Static aggregation data (host setup, reused across Jacobians)."""

    agg: Array           # (ndof,) int32 aggregate id; -1 for constrained dofs
    n_agg: int
    dofmap: Array        # (E, n)
    free: Array          # (ndof,) bool
    omega: float = 0.6   # Jacobi damping


def build_aggregates(dofmap: np.ndarray, ndof: int, free: np.ndarray,
                     target_coarse: int = 256,
                     dof_coords: np.ndarray = None) -> np.ndarray:
    """Aggregation of free dofs into <= target_coarse compact groups.

    Primary (``dof_coords`` given — every production call site): GEOMETRIC
    Morton-block aggregation — free dofs are Z-ordered and split into
    ~equal contiguous runs, so every aggregate is a spatially compact
    patch and the piecewise-constant coarse space resolves the smooth
    error modes a two-level scheme exists for.

    Fallback (no coordinates): element-seeded greedy graph aggregation
    with a size cap. (The r1 version had no cap — on a connected mesh in
    contiguous element order every element shares a dof with an earlier
    one, the first aggregate flooded the whole mesh, and the coarse space
    collapsed to a single constant, i.e. smoothed Jacobi. The r1 modular
    ``agg % target_coarse`` coalescing then merged spatially unrelated
    remnants.)
    """
    dofmap = np.asarray(dofmap)
    free = np.asarray(free)
    agg = np.full(ndof, -1, dtype=np.int64)
    free_ids = np.where(free)[0]
    if len(free_ids) == 0:
        return agg.astype(np.int32), 0

    if dof_coords is not None:
        from .block_ras import morton_order
        perm = morton_order(np.asarray(dof_coords)[free_ids])
        n_agg = min(target_coarse, len(free_ids))
        bounds = np.linspace(0, len(free_ids), n_agg + 1).astype(np.int64)
        for k in range(n_agg):
            agg[free_ids[perm[bounds[k]:bounds[k + 1]]]] = k
        return agg.astype(np.int32), n_agg

    cap = max(3, -(-len(free_ids) // target_coarse))
    size = []
    next_id = 0
    for e in range(dofmap.shape[0]):
        dofs = [d for d in dofmap[e] if free[d]]
        unassigned = [d for d in dofs if agg[d] < 0]
        if not unassigned:
            continue
        assigned = [d for d in dofs if agg[d] >= 0]
        if assigned and size[agg[assigned[0]]] < cap:
            a = agg[assigned[0]]
        else:
            a = next_id
            next_id += 1
            size.append(0)
        for d in unassigned:
            agg[d] = a
        size[a] += len(unassigned)
    if next_id > target_coarse:
        sel = agg >= 0
        agg[sel] = agg[sel] % target_coarse
        next_id = target_coarse
    return agg.astype(np.int32), next_id


def make_amg_context(dofmap, ndof: int, free, target_coarse: int = 256,
                     omega: float = 0.6, dof_coords=None) -> AmgContext:
    free = np.asarray(free)
    if free.ndim == 2:
        # batched systems (e.g. the two species): aggregate over the union
        # of free dofs — aggregation is only a graph partition; the actual
        # per-system masks are enforced at apply time
        free = free.any(axis=0)
    agg, n_agg = build_aggregates(np.asarray(dofmap), ndof, free,
                                  target_coarse, dof_coords=dof_coords)
    return AmgContext(agg=jnp.asarray(agg), n_agg=n_agg,
                      dofmap=jnp.asarray(dofmap), free=jnp.asarray(free),
                      omega=omega)


def two_level_precond(A_el: Array, ctx: AmgContext, diag: Array, free=None):
    """Build M^-1 from element Jacobian blocks for this aggregation.

    Accepts flat inputs (A_el (E, n, n), diag/free (ndof,)) or batched
    systems (A_el (S, E, n, n), diag/free (S, ndof) — e.g. the two species
    stage systems); the returned M applies to residuals of the matching
    shape. ``free`` defaults to the aggregation's (union) mask."""
    free = ctx.free if free is None else free
    squeeze = A_el.ndim == 3
    A_b = A_el[None] if squeeze else A_el
    S = A_b.shape[0]
    ndof = diag.shape[-1]
    diag_b = jnp.broadcast_to(diag if diag.ndim == 2 else diag[None],
                              (S, ndof))
    free_b = jnp.broadcast_to(free if free.ndim == 2 else free[None],
                              (S, ndof))
    # element-local aggregate ids (constrained -> dumped into slot n_agg)
    eagg = jnp.where(ctx.agg[ctx.dofmap] < 0, ctx.n_agg, ctx.agg[ctx.dofmap])
    nc = ctx.n_agg + 1
    # Galerkin coarse matrices by 2-D scatter-add of element blocks
    s_ix = jnp.arange(S)[:, None, None, None]
    Ac = jnp.zeros((S, nc, nc)).at[
        s_ix, eagg[None, :, :, None], eagg[None, :, None, :]].add(A_b)
    Ac = Ac[:, :ctx.n_agg, :ctx.n_agg]
    # regularize empty aggregates
    Ac = Ac + 1e-12 * jnp.eye(ctx.n_agg)
    L = jnp.linalg.cholesky(Ac)                       # batched factor
    coarse_solve = jax.vmap(
        lambda Lk, bk: jax.scipy.linalg.cho_solve((Lk, True), bk))

    inv_d = jnp.where(free_b, ctx.omega / diag_b, 0.0)
    safe = jnp.where(ctx.agg < 0, ctx.n_agg, ctx.agg)

    def apply_A(x):
        xi = jnp.where(free_b, x, 0.0)
        y = FA.spmv_batched(A_b, xi, ctx.dofmap, ndof)
        return jnp.where(free_b, y, x)

    def restrict(r):
        rc = jnp.zeros((S, nc)).at[
            jnp.arange(S)[:, None], safe[None]].add(
                jnp.where(free_b, r, 0.0))
        return rc[:, :ctx.n_agg]

    def prolong(zc):
        z = zc[:, jnp.clip(ctx.agg, 0)]
        z = jnp.where(ctx.agg[None] < 0, 0.0, z)
        return jnp.where(free_b, z, 0.0)

    def M(r):
        rb = r[None] if squeeze else r
        z = inv_d * rb                                # pre-smooth
        resid = rb - apply_A(z)
        zc = coarse_solve(L, restrict(resid))
        z = z + prolong(zc)                           # coarse correction
        z = z + inv_d * (rb - apply_A(z))             # post-smooth
        out = jnp.where(free_b, z, rb)
        return out[0] if squeeze else out

    return M

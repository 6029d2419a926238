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
                     target_coarse: int = 256) -> np.ndarray:
    """Greedy element-seeded aggregation of free dofs.

    Walk elements; an element whose free dofs are all unaggregated seeds a
    new aggregate; remaining dofs join a neighbor's aggregate. Aggregate
    count is then coalesced down to <= target_coarse by modular folding
    (keeps setup trivial; quality is adequate for a two-level scheme).
    """
    dofmap = np.asarray(dofmap)
    free = np.asarray(free)
    agg = np.full(ndof, -1, dtype=np.int64)
    next_id = 0
    for e in range(dofmap.shape[0]):
        dofs = [d for d in dofmap[e] if free[d]]
        if not dofs:
            continue
        unassigned = [d for d in dofs if agg[d] < 0]
        assigned = [d for d in dofs if agg[d] >= 0]
        if not unassigned:
            continue
        if assigned:
            for d in unassigned:
                agg[d] = agg[assigned[0]]
        else:
            for d in unassigned:
                agg[d] = next_id
            next_id += 1
    if next_id > target_coarse:
        agg[agg >= 0] = agg[agg >= 0] % target_coarse
        next_id = target_coarse
    return agg.astype(np.int32), next_id


def make_amg_context(dofmap, ndof: int, free, target_coarse: int = 256,
                     omega: float = 0.6) -> AmgContext:
    agg, n_agg = build_aggregates(np.asarray(dofmap), ndof, np.asarray(free),
                                  target_coarse)
    return AmgContext(agg=jnp.asarray(agg), n_agg=n_agg,
                      dofmap=jnp.asarray(dofmap), free=jnp.asarray(free),
                      omega=omega)


def two_level_precond(A_el: Array, ctx: AmgContext, diag: Array):
    """Build M^-1 from element Jacobian blocks for this aggregation."""
    ndof = diag.shape[0]
    # element-local aggregate ids (constrained -> dumped into slot n_agg)
    eagg = jnp.where(ctx.agg[ctx.dofmap] < 0, ctx.n_agg, ctx.agg[ctx.dofmap])
    nc = ctx.n_agg + 1
    # Galerkin coarse matrix by 2-D scatter-add of element blocks
    Ac = jnp.zeros((nc, nc)).at[eagg[:, :, None], eagg[:, None, :]].add(A_el)
    Ac = Ac[:ctx.n_agg, :ctx.n_agg]
    # regularize empty aggregates
    Ac = Ac + 1e-12 * jnp.eye(ctx.n_agg)
    chol = jax.scipy.linalg.cho_factor(Ac)

    inv_d = jnp.where(ctx.free, ctx.omega / diag, 0.0)

    def apply_A(x):
        xi = jnp.where(ctx.free, x, 0.0)
        y = FA.spmv(A_el, xi, ctx.dofmap, ndof)
        return jnp.where(ctx.free, y, x)

    def restrict(r):
        safe = jnp.where(ctx.agg < 0, ctx.n_agg, ctx.agg)
        rc = jnp.zeros(nc).at[safe].add(jnp.where(ctx.free, r, 0.0))
        return rc[:ctx.n_agg]

    def prolong(zc):
        z = jnp.where(ctx.agg < 0, 0.0, zc[jnp.clip(ctx.agg, 0)])
        return jnp.where(ctx.free, z, 0.0)

    def M(r):
        z = inv_d * r                                 # pre-smooth
        resid = r - apply_A(z)
        zc = jax.scipy.linalg.cho_solve(chol, restrict(resid))
        z = z + prolong(zc)                           # coarse correction
        z = z + inv_d * (r - apply_A(z))              # post-smooth
        return jnp.where(ctx.free, z, r)

    return M

"""Batched global assembly: gather -> element kernel -> segment-sum scatter.

TPU-native replacement for PDELab's ``GridOperator`` residual/Jacobian
assembly loop (bound by the reference at
src/instationary_pnp_from_pb_md.hh:185-186). Instead of a per-element C++
loop writing into a BCRS matrix, we:

  * gather element dof values ``u[dofmap]`` as one (E, ndof_el) array,
  * evaluate all element residuals/Jacobians as dense batched contractions,
  * scatter-add with a single XLA scatter (``.at[].add``),
  * keep the Jacobian *unassembled* as per-element dense blocks and apply it
    matrix-free in Krylov iterations (gather -> batched matvec -> scatter),
    the "consistent matrix / additive vector" nonoverlapping scheme of
    DUNE-ISTL's NOVLP solvers re-expressed as pure data parallelism.

Dirichlet constraints are boolean dof masks; constrained rows of residuals
are zeroed and the constrained Jacobian acts as identity on constrained dofs
(preserving SPD-ness for CG).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Array = Any


def gather(u: Array, dofmap: Array) -> Array:
    """u (ndof,) -> element dof values (E, ndof_el)."""
    return u[dofmap]


def scatter_add(values: Array, dofmap: Array, ndof: int) -> Array:
    """Accumulate per-element values (E, ndof_el) into a global (ndof,) vector."""
    return jnp.zeros(ndof, dtype=values.dtype).at[dofmap.ravel()].add(
        values.ravel(), mode="drop")


def spmv(A_el: Array, x: Array, dofmap: Array, ndof: int) -> Array:
    """Matrix-free SpMV from per-element dense blocks.

    A_el: (E, ndof_el, ndof_el); x: (ndof,). Returns A @ x as (ndof,).
    """
    xe = x[dofmap]                                  # (E, ndof_el)
    ye = jnp.einsum("eij,ej->ei", A_el, xe)
    return scatter_add(ye, dofmap, ndof)


def spmv_batched(A_el: Array, x: Array, dofmap: Array, ndof: int) -> Array:
    """Batched matrix-free SpMV: S independent systems in one program.

    A_el: (S, E, n, n); x: (S, ndof). One gather/einsum/scatter for all
    systems — on TPU each op in a solver loop costs fixed latency, so
    stacking systems divides the per-system cost by S.
    """
    S = x.shape[0]
    xe = x[:, dofmap]                               # (S, E, n)
    ye = jnp.einsum("seij,sej->sei", A_el, xe)
    return jnp.zeros((S, ndof), dtype=x.dtype).at[:, dofmap.ravel()].add(
        ye.reshape(S, -1), mode="drop")


def make_constrained_operator_batched(A_el, dofmap, ndof: int, free):
    """Batched variant of make_constrained_operator: free is (S, ndof)."""

    def op(x: Array) -> Array:
        xi = jnp.where(free, x, 0.0)
        y = spmv_batched(A_el, xi, dofmap, ndof)
        return jnp.where(free, y, x)

    return op


def diagonal(A_el: Array, dofmap: Array, ndof: int) -> Array:
    """Global matrix diagonal from element blocks (for Jacobi smoothing)."""
    d = jnp.einsum("eii->ei", A_el)
    return scatter_add(d, dofmap, ndof)


def constrain_residual(r: Array, free: Array) -> Array:
    """Zero residual entries on constrained (Dirichlet) dofs."""
    return jnp.where(free, r, 0.0)


def make_constrained_operator(A_el: Array, dofmap: Array, ndof: int, free: Array):
    """Return y = A_c @ x where A_c is A with Dirichlet rows/cols replaced by
    identity: y_c = x_c on constrained dofs, couplings masked out."""

    def op(x: Array) -> Array:
        xi = jnp.where(free, x, 0.0)
        y = spmv(A_el, xi, dofmap, ndof)
        return jnp.where(free, y, x)

    return op


def constrained_diagonal(A_el: Array, dofmap: Array, ndof: int, free: Array) -> Array:
    d = diagonal(A_el, dofmap, ndof)
    return jnp.where(free, d, 1.0)


def dense_constrained_matrix_batched(A_el: Array, dofmap: Array, ndof: int,
                                     free: Array) -> Array:
    """Batched dense assembly: A_el (S, E, n, n), free (S, ndof) ->
    (S, ndof, ndof) with Dirichlet identity rows/cols per system."""
    S = A_el.shape[0]
    A = jnp.zeros((S, ndof, ndof), dtype=A_el.dtype).at[
        jnp.arange(S)[:, None, None, None],
        dofmap[None, :, :, None],
        dofmap[None, :, None, :]].add(A_el)
    f = free.astype(A.dtype)
    A = A * f[:, :, None] * f[:, None, :]
    A = A + jax.vmap(jnp.diag)(1.0 - f)
    return A


def dense_constrained_matrix(A_el: Array, dofmap: Array, ndof: int,
                             free: Array) -> Array:
    """Assemble the FULL (ndof, ndof) matrix with Dirichlet identity rows.

    TPU-native option for constant operators on small/medium meshes: one
    2-D scatter-add of the element blocks; the precomputed inverse turns
    every subsequent solve into a single MXU matmul (see
    workloads/instationary_pnp_from_pb.py dense-Poisson path). Memory is
    ndof^2 * 8 bytes — caller gates on size.
    """
    A = jnp.zeros((ndof, ndof), dtype=A_el.dtype).at[
        dofmap[:, :, None], dofmap[:, None, :]].add(A_el)
    # Dirichlet rows/cols -> identity
    f = free.astype(A.dtype)
    A = A * f[:, None] * f[None, :]
    A = A + jnp.diag(1.0 - f)
    return A


def make_constrained_operator_mixed(A_el: Array, dofmap: Array, ndof: int,
                                    free: Array):
    """Mixed-precision constrained operator: f32 SpMV, f64 interface.

    The large-mesh roadmap form (CLAUDE.md): element blocks are cast ONCE
    to f32 (halving the dominant HBM stream of the matrix-free apply) and
    the einsum contracts in true f32 (precision=HIGHEST — the TPU default
    would drop the blocks to bf16 passes); Krylov vectors, dots, and
    recurrences stay f64 in the caller. A single apply is ~1e-7-accurate
    relative, so reductions beyond ~1e-6 need outer f64 refinement
    (solve to 1e-5, recompute the f64 residual, re-solve — two passes
    reach 1e-10; see workloads' Poisson path). Accepts flat (E, n, n) +
    (ndof,) or batched (S, E, n, n) + (S, ndof) like the f64 operators.
    """
    A32 = A_el.astype(jnp.float32)
    batched = A_el.ndim == 4

    def op(x: Array) -> Array:
        xi = jnp.where(free, x, 0.0).astype(jnp.float32)
        if batched:
            xe = xi[:, dofmap]
            ye = jnp.einsum("seij,sej->sei", A32, xe,
                            precision=jax.lax.Precision.HIGHEST)
            S = x.shape[0]
            y = jnp.zeros((S, ndof), jnp.float32).at[
                :, dofmap.ravel()].add(ye.reshape(S, -1))
        else:
            xe = xi[dofmap]
            ye = jnp.einsum("eij,ej->ei", A32, xe,
                            precision=jax.lax.Precision.HIGHEST)
            y = jnp.zeros((ndof,), jnp.float32).at[dofmap.ravel()].add(
                ye.reshape(-1))
        return jnp.where(free, y.astype(x.dtype), x)

    return op

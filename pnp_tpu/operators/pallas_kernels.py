"""Pallas TPU kernels for the hot element-assembly ops.

The batched element evaluation is the engine's hot loop (SURVEY.md "HOT
LOOP 1"). The jnp/einsum path already fuses well under XLA; this Pallas
kernel goes further for the Newton hot path by producing the PB residual
AND the analytic element Jacobian in ONE pass over the element tables
(one HBM read of gradphi/qw instead of two, one kernel launch instead of
several), tiled over element blocks in VMEM.

Mosaic-dictated design (see /opt/skills/guides/pallas_guide.md and the
failures catalogued in CLAUDE.md):
  * f32 only on hardware — Mosaic implements no f64 dot/transcendentals
    (interpret mode runs any dtype; f32 matches the engine's dense-LU
    stage-solve precision, with f64 refinement outside);
  * no sinh/cosh primitives — exp-based forms;
  * no >4-D broadcasts, gathers, or strided ref stores — the dof (n) and
    spatial (d) axes are moved to LEADING block dimensions with static
    extents, so every in-kernel tensor is a 2-D (tile, quad) block indexed
    by static python ints, and outputs are written as whole blocks.

Layouts: shape_t (n, q), ue_t (n, E), gp_t (n, 2, E, q), qw/qy (E, q);
outputs r_t (n, E), A_t (n, n, E). ``pb_residual_jacobian_pallas`` wraps
the transposes and exposes the engine's natural (E, ...) layout.

STATUS (r2, jax 0.9.0 Mosaic):
  * ``batched_inverse_pallas`` (below) COMPILES AND RUNS ON HARDWARE:
    correct to ~1.5e-6 f32 on synthetic batches at (2, 3072)/(94, 512)
    and on the real pore stage batch at the initial state, and faster
    than XLA getrf+getri at the RAS-factor shape (41.8 -> 18.3 ms).
    The elimination now does IN-BLOCK PARTIAL PIVOTING (row swaps inside
    each 128-pivot block, column unswaps at the end), which fixes the
    permuted/zero-diagonal failure class; the numpy simulation on dumped
    late-transient pore stage matrices (tools/gj_pivot_study.py) shows
    CROSS-BLOCK pivot growth can still make the refinement contraction
    diverge on the worst steps (LAPACK's full partial pivoting does not),
    so production use stays behind the contraction-probe-guarded
    fallback (solvers/direct.py:batched_inv_f32) and the switch is
    OPT-IN (PNP_TPU_PALLAS_INV=1) pending the tools/tpu_pallas_e2e.py
    net-win measurement. tools/tpu_pallas_check.py is the hardware
    check + chained-timing script.
  * the fused PB element kernel remains interpret-verified only:
    hardware compilation trips Mosaic layout legalization on the tiny
    minor extents (q = 4, n = 3 blocks vs the (8, 128) tile grid), and
    the XLA einsum assembly it would replace already fuses well (the PB
    Newton is a one-time bootstrap, ~zero per-step cost) — kept as a
    semantics pin, not a production path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = Any

ELEM_TILE = 256


def _make_pb_kernel(n: int):
    def kernel(shape_ref, ue_ref, gp_ref, qw_ref, qy_ref, params_ref,
               r_ref, A_ref):
        qw = qw_ref[:]                       # (T, q)
        qy = qy_ref[:]
        coef = params_ref[0, 0]
        cyl = params_ref[0, 1]
        two_pi = params_ref[0, 2]
        f = qw * (1.0 + cyl * (qy * two_pi - 1.0))     # (T, q)

        # u(q) and grad u(q, d) from leading-static-axis blocks
        u = jnp.zeros_like(f)
        for i in range(n):
            u = u + ue_ref[i][:, None] * shape_ref[i][None, :]
        gu = []
        for d in range(2):
            g = jnp.zeros_like(f)
            for i in range(n):
                g = g + ue_ref[i][:, None] * gp_ref[i, d]
            gu.append(g)

        eu = jnp.exp(u)                      # Mosaic has no sinh/cosh
        ei = 1.0 / eu
        fsh = coef * 0.5 * (eu - ei) * f
        fch = coef * 0.5 * (eu + ei) * f

        for i in range(n):
            dot_i = gu[0] * gp_ref[i, 0] + gu[1] * gp_ref[i, 1]
            r_ref[i] = jnp.sum(f * dot_i + fsh * shape_ref[i][None, :],
                               axis=1)
            for j in range(n):
                dot_ij = (gp_ref[i, 0] * gp_ref[j, 0]
                          + gp_ref[i, 1] * gp_ref[j, 1])
                A_ref[i, j] = jnp.sum(
                    f * dot_ij
                    + fch * shape_ref[i][None, :] * shape_ref[j][None, :],
                    axis=1)

    return kernel


def pb_residual_jacobian_pallas(ue: Array, shape: Array, gradphi: Array,
                                qw: Array, qy: Array, l_b: float, c0: float,
                                cylindrical: bool, pi: float,
                                interpret: bool = False):
    """Fused PB element residual + Jacobian.

    ue (E, n), shape (q, n), gradphi (E, q, n, 2), qw/qy (E, q); E must be
    a multiple of ELEM_TILE (pad with qw = 0 rows). Returns (r (E, n),
    A (E, n, n)). f32 recommended on hardware (see module docstring).
    """
    E, n = ue.shape
    q = shape.shape[0]
    assert E % ELEM_TILE == 0, f"pad E={E} to a multiple of {ELEM_TILE}"
    dtype = ue.dtype
    coef = 8.0 * pi * l_b * c0
    params = jnp.array([[coef, 1.0 if cylindrical else 0.0, 2.0 * pi, 0.0]],
                       dtype=dtype)
    shape_t = jnp.asarray(shape, dtype).T                    # (n, q)
    ue_t = ue.T                                              # (n, E)
    gp_t = jnp.transpose(gradphi, (2, 3, 0, 1))              # (n, 2, E, q)
    grid = (E // ELEM_TILE,)

    r_t, A_t = pl.pallas_call(
        _make_pb_kernel(n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, q), lambda i: (0, 0)),              # shape_t
            pl.BlockSpec((n, ELEM_TILE), lambda i: (0, i)),      # ue_t
            pl.BlockSpec((n, 2, ELEM_TILE, q), lambda i: (0, 0, i, 0)),
            pl.BlockSpec((ELEM_TILE, q), lambda i: (i, 0)),      # qw
            pl.BlockSpec((ELEM_TILE, q), lambda i: (i, 0)),      # qy
            pl.BlockSpec((1, 4), lambda i: (0, 0)),              # params
        ],
        out_specs=[
            pl.BlockSpec((n, ELEM_TILE), lambda i: (0, i)),
            pl.BlockSpec((n, n, ELEM_TILE), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, E), dtype),
            jax.ShapeDtypeStruct((n, n, E), dtype),
        ],
        interpret=interpret,
    )(shape_t, ue_t, gp_t, qw, qy, params)
    return r_t.T, jnp.transpose(A_t, (2, 0, 1))


def pad_to_tile(arr, tile: int = ELEM_TILE, fill=0.0):
    """Pad axis 0 to a multiple of the element tile."""
    E = arr.shape[0]
    pad = (-E) % tile
    if pad == 0:
        return arr
    width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, width, constant_values=fill)


# ---------------------------------------------------------------------------
# Batched dense inverse: blocked Gauss-Jordan as ONE Pallas program.
#
# Why: the species stage solve inverts the (2, N, N) f32 stage matrices every
# production step (solvers/direct.py). XLA's getrf+getri walks N/128 panels
# as XLA-level loop steps, each paying the TPU's fixed per-op dispatch
# latency, and serializes over the batch — measured 25.5 ms at (2, 3048).
# Inside one Pallas program the same panel walk is grid steps with ~us
# overhead and the work is MXU matmuls on VMEM-resident tiles.
#
# Algorithm: in-place blocked Gauss-Jordan WITHOUT pivoting (the stage
# matrices are mass+diffusion dominated with identity Dirichlet rows; the
# caller's f64 iterative refinement residual-checks every solve, so a
# quality loss would only raise refinement counts, never break results).
# For pivot block k with P = inv(A[k,k]):
#     A[k, :]  <- P A[k, j!=k],  A[k,k] <- P
#     A[i, :] -= A[i,k] (P A[k,j!=k]),  A[i,k] <- -A[i,k] P     (i != k)
# After all K = N/B steps A holds inv(A).
#
# Grid: (S, K, NI) sequential; step (s, k, i) owns row block
# r = (k+i) mod NI. At i=0 the block IS the pivot row: P and the scratch
# row R = [P A[k,j!=k] | P] are computed from it and written back in the
# same step; later i only read their own row block + scratch.
#
# The matrix lives in HBM as the OUTPUT buffer (seeded from the input via
# input_output_aliases) and row blocks move via explicit in-kernel DMA:
# automatic block pipelining cannot express in-place read-after-write
# across grid steps (the pipelined input prefetch reads stale data — and
# interpret mode reads the pre-donation copy), while explicit DMAs on the
# out ref are sequenced by their semaphores.
# ---------------------------------------------------------------------------

GJ_BLOCK = 128


def _gj_inv_small(Pbuf, permbuf, n: int):
    """In-place unblocked Gauss-Jordan inverse of the (n, n) VMEM block
    ``Pbuf`` with PARTIAL PIVOTING, vectorized row elimination per
    iteration. ``permbuf`` is a (1, n) i32 VMEM scratch recording the
    pivot-row sequence; after the forward sweep the recorded column swaps
    are undone in reverse order (classic in-place pivoted Gauss-Jordan).
    In-block pivoting is what makes the blocked inverse survive the real
    advection-dominated stage matrices (no-pivot elimination went
    non-finite on them even after diagonal equilibration; validated in
    tools/gj_pivot_study.py against dumped late-transient pore matrices).

    Mosaic constraints shape the implementation: every ``jnp.where``
    predicate is built at the FULL operand shape (jax 0.9 Mosaic lowers
    sub-shape bool broadcasts through a bool->int32 convert that recurses
    forever), and pivot values / rows / columns are extracted by masked
    reduction instead of lane-dynamic slicing (single-lane dynamic slices
    are not 128-aligned). The loop bounds/carry are pinned to i32: the
    engine runs with x64 enabled, under which plain-int ``fori_loop``
    bounds become weak i64 — and jax 0.9 Mosaic lowers the resulting
    i64->i32 index demotion through a convert helper that self-recurses."""

    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rows_n1 = rows[:, 0:1]                                 # (n, 1)
    cols_1n = cols[0:1, :]                                 # (1, n)

    def body(r, _):
        M = Pbuf[:]
        cmask = cols == r                                  # (n, n)
        zero = jnp.zeros((), M.dtype)
        c0 = jnp.sum(jnp.where(cmask, M, zero), axis=1, keepdims=True)  # (n,1)
        # pivot row p = lowest index among rows >= r with max |column r|
        elig = rows_n1 >= r                                # (n, 1)
        score = jnp.where(elig, jnp.abs(c0), jnp.full((n, 1), -1.0, M.dtype))
        pmask = (score == jnp.max(score)) & elig
        p = jnp.min(jnp.where(pmask, rows_n1, jnp.int32(n)))
        permbuf[:] = jnp.where(cols_1n == r,
                               jnp.full((1, n), 0, jnp.int32) + p,
                               permbuf[:])
        # swap rows r <-> p through the ref: sublane-dynamic slice loads +
        # stores are O(row), not O(matrix) (the previous masked-select form
        # cost three full (n, n) reductions per iteration and dominated the
        # whole blocked inverse: 248 ms vs XLA's 41.8 at (94, 512))
        row_r = Pbuf[pl.ds(r, 1), :]
        row_p = Pbuf[pl.ds(p, 1), :]
        Pbuf[pl.ds(r, 1), :] = row_p
        Pbuf[pl.ds(p, 1), :] = row_r
        # column r after the swap = c0 with entries r, p exchanged ((n, 1)
        # fixup instead of a second (n, n) reduction); the pivot value
        # M[r, r] post-swap is c0[p]
        c0r = jnp.sum(jnp.where(rows_n1 == r, c0, zero))
        # extract the pivot from the SINGLE selected row p (pmask can hold
        # several rows tying for max |score|: summing over it cancels +v/-v
        # ties to a 0 pivot and doubles same-sign ties)
        piv = jnp.sum(jnp.where(rows_n1 == p, c0, zero))
        c = jnp.where(rows_n1 == r, piv,
                      jnp.where(rows_n1 == p, c0r, c0))
        ipiv = 1.0 / piv
        rowvec = jnp.broadcast_to(row_p * ipiv, (n, n))
        rmask = rows == r
        M2 = Pbuf[:]                                       # post-swap matrix
        M1 = M2 - c * rowvec                               # rank-1 eliminate
        M1 = jnp.where(rmask, rowvec, M1)                  # pivot row
        colvals = jnp.where(rmask, jnp.full((n, n), ipiv, M.dtype),
                            jnp.broadcast_to(-c * ipiv, (n, n)))
        Pbuf[:] = jnp.where(cmask, colvals, M1)
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, jnp.int32(0))

    # Undo the recorded row swaps as ONE column gather: build the index
    # vector g (apply the transpositions in reverse to iota — (1, n) i32
    # ops only), then inv_true = M @ Q with Q[i, j] = (g[j] == i) — a
    # single one-hot MXU matmul instead of n full-matrix column swaps.
    # Masked extractions use max, not sum: under x64 an i32 jnp.sum
    # accumulates in i64, which Mosaic cannot lower (entries are >= 0 and
    # non-matching slots read 0, so the masked max IS the stored entry).
    def unswap_body(t, g):
        r = jnp.int32(n - 1) - t
        sel_r = cols_1n == r
        p = jnp.max(jnp.where(sel_r, permbuf[:], jnp.int32(0)))
        sel_p = cols_1n == p
        gr = jnp.max(jnp.where(sel_r, g, jnp.int32(0)))
        gp = jnp.max(jnp.where(sel_p, g, jnp.int32(0)))
        return jnp.where(sel_r, gp, jnp.where(sel_p, gr, g))

    g = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), unswap_body, cols_1n)
    M = Pbuf[:]
    Q = (jnp.broadcast_to(g, (n, n)) == rows).astype(M.dtype)
    Pbuf[:] = jax.lax.dot_general(
        M, Q, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _make_gj_kernel(NI: int, B: int, N: int):
    def kernel(in_ref, out_ref, Pbuf, Rbuf, rowbuf, permbuf, sem):
        del in_ref  # seeds out_ref via input_output_aliases; never read
        s = pl.program_id(0)
        k = pl.program_id(1)
        i = pl.program_id(2)
        r = jax.lax.rem(k + i, jnp.int32(NI))
        kofs = pl.multiple_of(k * B, B)
        rofs = pl.multiple_of(r * B, B)

        load = pltpu.make_async_copy(
            out_ref.at[s, pl.ds(rofs, B), :], rowbuf, sem)
        load.start()
        load.wait()

        @pl.when(i == 0)
        def _():
            # the block is the pivot row: invert A[k,k], build the scratch
            # row R = [P A[k,:] with P in the k-block] in place
            Pbuf[:] = rowbuf[:, pl.ds(kofs, B)]
            _gj_inv_small(Pbuf, permbuf, B)
            Rbuf[:] = jax.lax.dot_general(
                Pbuf[:], rowbuf[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            Rbuf[:, pl.ds(kofs, B)] = Pbuf[:]
            rowbuf[:] = Rbuf[:]

        @pl.when(i != 0)
        def _():
            row = rowbuf[:]                                # (B, N)
            C = rowbuf[:, pl.ds(kofs, B)]                  # (B, B)
            new = row - jax.lax.dot_general(
                C, Rbuf[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            rowbuf[:] = new
            # k-block columns: target is -C P; the update above left
            # (C - C P) there, so subtract the original C (read back via
            # ref slicing — Mosaic has no value-level dynamic_slice)
            rowbuf[:, pl.ds(kofs, B)] = rowbuf[:, pl.ds(kofs, B)] - C

        store = pltpu.make_async_copy(
            rowbuf, out_ref.at[s, pl.ds(rofs, B), :], sem)
        store.start()
        store.wait()

    return kernel


def batched_inverse_pallas(A: Array, interpret: bool = False,
                           equilibrate: bool = True) -> Array:
    """Explicit inverses of a batch of dense f32 matrices, one Pallas
    program (blocked no-pivot Gauss-Jordan; see block comment above).

    A: (S, N, N) float32. N is padded internally to a multiple of 128 with
    identity rows/cols (exact: inv(blockdiag(A, I)) = blockdiag(inv(A), I)).

    ``equilibrate``: symmetric diagonal scaling A~ = S A S (S = 1/sqrt
    |diag A|) before elimination, inverse unscaled as S inv(A~) S.
    Constrained FEM matrices mix identity Dirichlet rows with mass-scale
    (~1e-4) free rows; no-pivot elimination compounds that scale mixing
    across panels and went non-finite on the real pore stage matrices —
    equilibration makes every pivot O(1).
    """
    if equilibrate:
        d = jnp.abs(jnp.diagonal(A, axis1=1, axis2=2))
        s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
        inv_eq = batched_inverse_pallas(A * s[:, :, None] * s[:, None, :],
                                        interpret=interpret,
                                        equilibrate=False)
        return inv_eq * s[:, :, None] * s[:, None, :]
    S, N0, _ = A.shape
    B = GJ_BLOCK
    N = ((N0 + B - 1) // B) * B
    if N != N0:
        pad = N - N0
        A = jnp.pad(A, ((0, 0), (0, pad), (0, pad)))
        eye_pad = jnp.zeros((N,), A.dtype).at[N0:].set(1.0)
        A = A + jnp.diag(eye_pad)[None]
    NI = N // B
    grid = (S, NI, NI)

    out = pl.pallas_call(
        _make_gj_kernel(NI, B, N),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((S, N, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, B), jnp.float32),
            pltpu.VMEM((B, N), jnp.float32),
            pltpu.VMEM((B, N), jnp.float32),
            pltpu.VMEM((1, B), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(A)
    return out[:, :N0, :N0] if N != N0 else out

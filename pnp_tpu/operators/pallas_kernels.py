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

STATUS: exact-parity verified in interpret mode (tests/test_pallas.py).
Hardware compilation still trips Mosaic layout legalization on the tiny
minor extents (q = 4, n = 3 blocks vs the (8, 128) tile grid) — packing
the fused (q*n*2) factor into a 128-padded lane dimension is the round-2
path to a compiled kernel. The production path remains the XLA einsum
assembly (which fuses well); this module pins the kernel semantics.
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

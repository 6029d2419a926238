"""Pallas TPU kernels for the hot element-assembly ops.

The batched element evaluation is the engine's hot loop (SURVEY.md "HOT
LOOP 1"). The jnp/einsum path already fuses well under XLA; this Pallas
kernel goes further for the Newton hot path by producing the PB residual
AND the analytic element Jacobian in ONE pass over the element tables
(one HBM read of gradphi/qw instead of two, one kernel launch instead of
several), tiled over element blocks in VMEM.

Layout notes (see /opt/skills/guides/pallas_guide.md):
  * element tables are reshaped so the minor axis is the fused
    (quad x dof x dim) factor — small and dense, VPU-friendly;
  * the element tile size is the sublane-aligned ELEM_TILE;
  * E is padded to a tile multiple by the caller (zero qw rows contribute
    zero, same convention as parallel.sharding).

The kernel is exact-arithmetic-equivalent to operators.volume.pb_* (tested
in interpret mode on CPU and compiled on TPU, tests/test_pallas.py).
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


def _pb_kernel(shape_ref, ue_ref, gradphi_ref, qw_ref, qy_ref, params_ref,
               r_ref, A_ref):
    """One element tile: fused PB residual + Jacobian.

    shapes per tile: ue (T, n), gradphi (T, q, n, 2), qw/qy (T, q),
    shape table (q, n) [replicated], params (1, 4) in SMEM-like layout:
    [coef, cylindrical, two_pi, unused]; outputs r (T, n), A (T, n, n).
    """
    shape = shape_ref[:]                    # (q, n)
    ue = ue_ref[:]                          # (T, n)
    gp = gradphi_ref[:]                     # (T, q, n, 2)
    qw = qw_ref[:]                          # (T, q)
    qy = qy_ref[:]
    coef = params_ref[0, 0]
    cyl = params_ref[0, 1]
    two_pi = params_ref[0, 2]

    f = qw * (1.0 + cyl * (qy * two_pi - 1.0))     # (T, q)
    u = jnp.einsum("ti,qi->tq", ue, shape)         # (T, q)
    gu = jnp.einsum("ti,tqid->tqd", ue, gp)        # (T, q, 2)
    sh = jnp.sinh(u)
    ch = jnp.cosh(u)

    r = jnp.einsum("tqd,tqid,tq->ti", gu, gp, f)
    r += jnp.einsum("tq,qi,tq->ti", coef * sh, shape, f)
    r_ref[:] = r

    A = jnp.einsum("tq,tqid,tqjd->tij", f, gp, gp)
    A += jnp.einsum("tq,qi,qj->tij", f * coef * ch, shape, shape)
    A_ref[:] = A


def pb_residual_jacobian_pallas(ue: Array, shape: Array, gradphi: Array,
                                qw: Array, qy: Array, l_b: float, c0: float,
                                cylindrical: bool, pi: float,
                                interpret: bool = False):
    """Fused PB element residual + Jacobian.

    ue (E, n), shape (q, n), gradphi (E, q, n, 2), qw/qy (E, q); E must be
    a multiple of ELEM_TILE (pad with qw = 0 rows). Returns (r (E, n),
    A (E, n, n)).
    """
    E, n = ue.shape
    q = shape.shape[0]
    assert E % ELEM_TILE == 0, f"pad E={E} to a multiple of {ELEM_TILE}"
    dtype = ue.dtype
    coef = 8.0 * pi * l_b * c0
    params = jnp.array([[coef, 1.0 if cylindrical else 0.0, 2.0 * pi, 0.0]],
                       dtype=dtype)
    grid = (E // ELEM_TILE,)

    def im(i):
        return (i, 0)

    r, A = pl.pallas_call(
        _pb_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, n), lambda i: (0, 0)),                  # shape
            pl.BlockSpec((ELEM_TILE, n), im),                        # ue
            pl.BlockSpec((ELEM_TILE, q, n, 2), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((ELEM_TILE, q), im),                        # qw
            pl.BlockSpec((ELEM_TILE, q), im),                        # qy
            pl.BlockSpec((1, 4), lambda i: (0, 0)),                  # params
        ],
        out_specs=[
            pl.BlockSpec((ELEM_TILE, n), im),
            pl.BlockSpec((ELEM_TILE, n, n), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E, n), dtype),
            jax.ShapeDtypeStruct((E, n, n), dtype),
        ],
        interpret=interpret,
    )(shape, ue, gradphi, qw, qy, params)
    return r, A


def pad_to_tile(arr, tile: int = ELEM_TILE, fill=0.0):
    """Pad axis 0 to a multiple of the element tile."""
    E = arr.shape[0]
    pad = (-E) % tile
    if pad == 0:
        return arr
    width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, width, constant_values=fill)

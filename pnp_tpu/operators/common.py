"""Shared helpers for batched weak-form kernels."""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.geometry import VolumeTables, BoundaryTables


def qfactor(t: VolumeTables, cylindrical: bool, pi: float):
    """Quadrature factor w*|detJ| with optional axisymmetric 2*pi*y weight.

    Parity: the reference multiplies by ``globalpos[1]*2*PI`` when
    ``cylindrical`` (src/pb_operator.hh:85-86). Note the reference applies
    this in PB/Poisson/PNP operators but NOT in the species drift-diffusion
    and scalar mass operators (src/diffusion_operator.hh:100,
    src/diffusion_toperator.hh:69) — callers wire the flag per operator.
    """
    f = t.qw
    if cylindrical:
        f = f * t.qy * (2.0 * pi)
    return f


def bqfactor(t: BoundaryTables, cylindrical: bool, pi: float):
    f = t.qw
    if cylindrical:
        f = f * t.qy * (2.0 * pi)
    return f


def interp(ue, shape):
    """Element dof values (E, n) x shape table (nq, n) -> u at quad (E, nq)."""
    return jnp.einsum("ei,qi->eq", ue, shape)


def interp_grad(ue, gradphi):
    """(E, n) x (E, nq, n, 2) -> grad u at quad points (E, nq, 2)."""
    return jnp.einsum("ei,eqid->eqd", ue, gradphi)

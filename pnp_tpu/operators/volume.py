"""Scalar volume weak forms as batched element kernels.

Each kernel maps element dof values (E, n) -> per-element residual (E, n)
and (analytically) per-element Jacobian blocks (E, n, n). The analytic
Jacobians replace the reference's finite-difference ``NumericalJacobian*``
mixins (src/pb_operator.hh:24-27) and are validated against ``jax.jacfwd``
in tests/test_operators.py.

Weak forms (reference file:line cited per kernel); all integrals carry the
quadrature factor from :func:`..operators.common.qfactor`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.geometry import VolumeTables
from .common import qfactor, interp, interp_grad


def stiffness_matrix(t: VolumeTables, f):
    """Element stiffness  A_ij = sum_q f_q grad(phi_i).grad(phi_j)."""
    return jnp.einsum("eq,eqid,eqjd->eij", f, t.gradphi, t.gradphi)


def mass_matrix(t: VolumeTables, f):
    """Element mass  M_ij = sum_q f_q phi_i phi_j."""
    return jnp.einsum("eq,qi,qj->eij", f, t.shape, t.shape)


# --- Poisson-Boltzmann:  grad u . grad v + 8 pi l_b c0 sinh(u) v -----------
# (reference: src/pb_operator.hh:117)

def pb_residual_el(ue, t: VolumeTables, l_b, c0, cylindrical, pi):
    f = qfactor(t, cylindrical, pi)
    u = interp(ue, t.shape)
    gu = interp_grad(ue, t.gradphi)
    coef = 8.0 * pi * l_b * c0
    r = jnp.einsum("eqd,eqid,eq->ei", gu, t.gradphi, f)
    r += jnp.einsum("eq,qi,eq->ei", coef * jnp.sinh(u), t.shape, f)
    return r


def pb_jacobian_el(ue, t: VolumeTables, l_b, c0, cylindrical, pi):
    f = qfactor(t, cylindrical, pi)
    u = interp(ue, t.shape)
    coef = 8.0 * pi * l_b * c0
    A = stiffness_matrix(t, f)
    A += jnp.einsum("eq,qi,qj->eij", f * coef * jnp.cosh(u), t.shape, t.shape)
    return A


# --- decoupled Poisson:  grad u . grad v + 4 pi l_b (cm - cp) v ------------
# (reference: src/poisson_operator.hh:121-123; cp/cm are frozen fields)

def poisson_residual_el(ue, cpe, cme, t: VolumeTables, l_b, cylindrical, pi):
    f = qfactor(t, cylindrical, pi)
    gu = interp_grad(ue, t.gradphi)
    cp = interp(cpe, t.shape)
    cm = interp(cme, t.shape)
    r = jnp.einsum("eqd,eqid,eq->ei", gu, t.gradphi, f)
    r += jnp.einsum("eq,qi,eq->ei", 4.0 * pi * l_b * (cm - cp), t.shape, f)
    return r


def poisson_jacobian_el(t: VolumeTables, cylindrical, pi):
    return stiffness_matrix(t, qfactor(t, cylindrical, pi))


# --- linear diffusion (Laplace, a = F = 0):  grad u . grad v ---------------
# (reference: src/diff_operator.hh:95-101; no axisymmetric factor there)

def laplace_residual_el(ue, t: VolumeTables):
    gu = interp_grad(ue, t.gradphi)
    return jnp.einsum("eqd,eqid,eq->ei", gu, t.gradphi, t.qw)


def laplace_jacobian_el(t: VolumeTables):
    return stiffness_matrix(t, t.qw)


# --- species drift-diffusion:  grad c . grad v + z c (grad phi . grad v) ---
# (reference: src/diffusion_operator.hh:110; valency z = +-1; NOTE the
#  reference does NOT apply the axisymmetric factor in this operator even in
#  cylindrical runs — we reproduce that, the flag is the caller's choice)

def drift_diffusion_residual_el(ce, gphi, t: VolumeTables, valency,
                                cylindrical=False, pi=jnp.pi):
    """``gphi`` is grad(phi) at quad points (E, nq, 2), from the frozen
    potential's dof vector via :func:`interp_grad`."""
    f = qfactor(t, cylindrical, pi)
    c = interp(ce, t.shape)
    gc = interp_grad(ce, t.gradphi)
    r = jnp.einsum("eqd,eqid,eq->ei", gc, t.gradphi, f)
    r += valency * jnp.einsum("eq,eqd,eqid,eq->ei", c, gphi, t.gradphi, f)
    return r


def drift_diffusion_jacobian_el(gphi, t: VolumeTables, valency,
                                cylindrical=False, pi=jnp.pi):
    f = qfactor(t, cylindrical, pi)
    A = stiffness_matrix(t, f)
    A += valency * jnp.einsum("eq,eqd,eqid,qj->eij", f, gphi, t.gradphi, t.shape)
    return A


# --- scalar L2 mass:  c v ---------------------------------------------------
# (reference: src/diffusion_toperator.hh:69-71, no tau scaling, no
#  axisymmetric factor; tau-scaled cylindrical variant for the monolithic
#  PNP mass operator src/pnp_toperator.hh:96-99 — with the wrong-row
#  accumulation bug deliberately NOT replicated, see SURVEY.md quirks)

def mass_residual_el(ce, t: VolumeTables, scale=1.0, cylindrical=False, pi=jnp.pi):
    f = qfactor(t, cylindrical, pi) * scale
    c = interp(ce, t.shape)
    return jnp.einsum("eq,qi,eq->ei", c, t.shape, f)


def mass_jacobian_el(t: VolumeTables, scale=1.0, cylindrical=False, pi=jnp.pi):
    return mass_matrix(t, qfactor(t, cylindrical, pi) * scale)

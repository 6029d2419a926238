"""Scalar volume weak forms as batched element kernels.

Each kernel maps element dof values (E, n) -> per-element residual (E, n)
and (analytically) per-element Jacobian blocks (E, n, n). The analytic
Jacobians replace the reference's finite-difference ``NumericalJacobian*``
mixins (src/pb_operator.hh:24-27) and are validated against ``jax.jacfwd``
in tests/test_operators.py.

Weak forms (reference file:line cited per kernel); all integrals carry the
quadrature factor from :func:`..operators.common.qfactor`.

Every public kernel dispatches through
:func:`..operators.common.map_table_chunks`: above the element-chunk size
the contraction runs as a lax.map over element chunks, bounding the
lane-padded XLA temps that OOM'd the 367k-element level-3 compile
(VERDICT r3 item 1). Below it (the flagship / mid-size meshes) the
dispatch is a direct call and programs are unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.geometry import VolumeTables
from .common import qfactor, interp, interp_grad, map_table_chunks


def stiffness_matrix(t: VolumeTables, f):
    """Element stiffness  A_ij = sum_q f_q grad(phi_i).grad(phi_j)."""
    return jnp.einsum("eq,eqid,eqjd->eij", f, t.gradphi, t.gradphi)


def mass_matrix(t: VolumeTables, f):
    """Element mass  M_ij = sum_q f_q phi_i phi_j."""
    return jnp.einsum("eq,qi,qj->eij", f, t.shape, t.shape)


# --- Poisson-Boltzmann:  grad u . grad v + 8 pi l_b c0 sinh(u) v -----------
# (reference: src/pb_operator.hh:117)

def _pb_residual(t: VolumeTables, ue, l_b, c0, cylindrical, pi):
    f = qfactor(t, cylindrical, pi)
    u = interp(ue, t.shape)
    gu = interp_grad(ue, t.gradphi)
    coef = 8.0 * pi * l_b * c0
    r = jnp.einsum("eqd,eqid,eq->ei", gu, t.gradphi, f)
    r += jnp.einsum("eq,qi,eq->ei", coef * jnp.sinh(u), t.shape, f)
    return r


def pb_residual_el(ue, t: VolumeTables, l_b, c0, cylindrical, pi):
    return map_table_chunks(
        lambda tc, ue_c: _pb_residual(tc, ue_c, l_b, c0, cylindrical, pi),
        t, (ue,))


def _pb_jacobian(t: VolumeTables, ue, l_b, c0, cylindrical, pi):
    f = qfactor(t, cylindrical, pi)
    u = interp(ue, t.shape)
    coef = 8.0 * pi * l_b * c0
    A = stiffness_matrix(t, f)
    A += jnp.einsum("eq,qi,qj->eij", f * coef * jnp.cosh(u), t.shape, t.shape)
    return A


def pb_jacobian_el(ue, t: VolumeTables, l_b, c0, cylindrical, pi):
    return map_table_chunks(
        lambda tc, ue_c: _pb_jacobian(tc, ue_c, l_b, c0, cylindrical, pi),
        t, (ue,))


# --- decoupled Poisson:  grad u . grad v + 4 pi l_b (cm - cp) v ------------
# (reference: src/poisson_operator.hh:121-123; cp/cm are frozen fields)

def _poisson_residual(t: VolumeTables, ue, cpe, cme, l_b, cylindrical, pi):
    f = qfactor(t, cylindrical, pi)
    gu = interp_grad(ue, t.gradphi)
    cp = interp(cpe, t.shape)
    cm = interp(cme, t.shape)
    r = jnp.einsum("eqd,eqid,eq->ei", gu, t.gradphi, f)
    r += jnp.einsum("eq,qi,eq->ei", 4.0 * pi * l_b * (cm - cp), t.shape, f)
    return r


def poisson_residual_el(ue, cpe, cme, t: VolumeTables, l_b, cylindrical, pi):
    return map_table_chunks(
        lambda tc, u, cp, cm: _poisson_residual(tc, u, cp, cm, l_b,
                                                cylindrical, pi),
        t, (ue, cpe, cme))


def poisson_jacobian_el(t: VolumeTables, cylindrical, pi):
    return map_table_chunks(
        lambda tc: stiffness_matrix(tc, qfactor(tc, cylindrical, pi)), t)


# --- linear diffusion (Laplace, a = F = 0):  grad u . grad v ---------------
# (reference: src/diff_operator.hh:95-101; no axisymmetric factor there)

def laplace_residual_el(ue, t: VolumeTables):
    def body(tc, ue_c):
        gu = interp_grad(ue_c, tc.gradphi)
        return jnp.einsum("eqd,eqid,eq->ei", gu, tc.gradphi, tc.qw)

    return map_table_chunks(body, t, (ue,))


def laplace_jacobian_el(t: VolumeTables):
    return map_table_chunks(lambda tc: stiffness_matrix(tc, tc.qw), t)


# --- species drift-diffusion:  grad c . grad v + z c (grad phi . grad v) ---
# (reference: src/diffusion_operator.hh:110; valency z = +-1; NOTE the
#  reference does NOT apply the axisymmetric factor in this operator even in
#  cylindrical runs — we reproduce that, the flag is the caller's choice)

def _drift_diffusion_residual(t: VolumeTables, ce, gphi, valency,
                              cylindrical, pi):
    f = qfactor(t, cylindrical, pi)
    c = interp(ce, t.shape)
    gc = interp_grad(ce, t.gradphi)
    r = jnp.einsum("eqd,eqid,eq->ei", gc, t.gradphi, f)
    r += valency * jnp.einsum("eq,eqd,eqid,eq->ei", c, gphi, t.gradphi, f)
    return r


def drift_diffusion_residual_el(ce, gphi, t: VolumeTables, valency,
                                cylindrical=False, pi=jnp.pi):
    """``gphi`` is grad(phi) at quad points (E, nq, 2), from the frozen
    potential's dof vector via :func:`interp_grad`."""
    return map_table_chunks(
        lambda tc, c, g: _drift_diffusion_residual(tc, c, g, valency,
                                                   cylindrical, pi),
        t, (ce, gphi))


def _drift_diffusion_jacobian(t: VolumeTables, gphi, valency, cylindrical, pi):
    f = qfactor(t, cylindrical, pi)
    A = stiffness_matrix(t, f)
    A += valency * jnp.einsum("eq,eqd,eqid,qj->eij", f, gphi, t.gradphi,
                              t.shape)
    return A


def drift_diffusion_jacobian_el(gphi, t: VolumeTables, valency,
                                cylindrical=False, pi=jnp.pi):
    return map_table_chunks(
        lambda tc, g: _drift_diffusion_jacobian(tc, g, valency, cylindrical,
                                                pi),
        t, (gphi,))


# --- scalar L2 mass:  c v ---------------------------------------------------
# (reference: src/diffusion_toperator.hh:69-71, no tau scaling, no
#  axisymmetric factor; tau-scaled cylindrical variant for the monolithic
#  PNP mass operator src/pnp_toperator.hh:96-99 — with the wrong-row
#  accumulation bug deliberately NOT replicated, see SURVEY.md quirks)

def mass_residual_el(ce, t: VolumeTables, scale=1.0, cylindrical=False, pi=jnp.pi):
    def body(tc, c_el):
        f = qfactor(tc, cylindrical, pi) * scale
        c = interp(c_el, tc.shape)
        return jnp.einsum("eq,qi,eq->ei", c, tc.shape, f)

    return map_table_chunks(body, t, (ce,))


def mass_jacobian_el(t: VolumeTables, scale=1.0, cylindrical=False, pi=jnp.pi):
    return map_table_chunks(
        lambda tc: mass_matrix(tc, qfactor(tc, cylindrical, pi) * scale), t)

"""Monolithic 3-field Poisson-Nernst-Planck operator (phi, c+, c-).

Parity: reference src/pnp_operator.hh:165-193 (volume) and :198-315
(per-component Neumann boundary), on a lexicographically-blocked composite
space (phi dofs, then c+ dofs, then c- dofs). Weak form per quad point,
all terms axisymmetric-weighted when cylindrical:

  phi rows:  grad(phi).grad(v) + 4 pi l_b (c+ - c-) v
  c+  rows:  grad(c+).grad(v) - c+ (grad(phi).grad(v))
  c-  rows:  grad(c-).grad(v) + c- (grad(phi).grad(v))

CONVENTION NOTE: these signs are the reference's own and are internally
self-consistent (equilibria c+ = C e^{+phi}, c- = C e^{-phi} combine with
the phi row to reproduce PB), but they are the c+/c- MIRROR of the
operator-splitting production driver, whose DiffusionOperator uses
valency +1 for c+ giving c+ = C e^{-phi}
(src/diffusion_operator.hh:110 vs src/pnp_operator.hh:176-193 — the
monolithic drivers also interpolate initial values with the e^{-phi}
convention, another latent inconsistency in that spec code).

The mass operator for instationary runs is tau * c (+/-) * v on the species
blocks only (reference src/pnp_toperator.hh:96-99; its wrong-row
accumulation bug is NOT replicated, see SURVEY.md "quirks").

Element dof layout: concat([phi_e, cp_e, cm_e]) of size 3n; the composite
global dofmap offsets each field block by the scalar space size.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.geometry import VolumeTables
from .common import qfactor, interp, interp_grad, map_table_chunks
from .volume import stiffness_matrix, mass_matrix


def composite_dofmap(dofmap, ndof_scalar: int):
    """(E, n) scalar dofmap -> (E, 3n) composite map with field offsets."""
    return jnp.concatenate(
        [dofmap, dofmap + ndof_scalar, dofmap + 2 * ndof_scalar], axis=1)


def split_el(ue):
    n = ue.shape[-1] // 3
    return ue[..., :n], ue[..., n:2 * n], ue[..., 2 * n:]


def pnp_residual_el(ue, t: VolumeTables, l_b, cylindrical, pi):
    return map_table_chunks(
        lambda tc, u: _pnp_residual(u, tc, l_b, cylindrical, pi), t, (ue,))


def _pnp_residual(ue, t: VolumeTables, l_b, cylindrical, pi):
    phie, cpe, cme = split_el(ue)
    f = qfactor(t, cylindrical, pi)
    cp = interp(cpe, t.shape)
    cm = interp(cme, t.shape)
    gphi = interp_grad(phie, t.gradphi)
    gcp = interp_grad(cpe, t.gradphi)
    gcm = interp_grad(cme, t.gradphi)
    # advective projection (grad phi . grad v_i) per test function
    adv = jnp.einsum("eqd,eqid->eqi", gphi, t.gradphi)       # (E, nq, n)
    coef = 4.0 * pi * l_b

    r_phi = jnp.einsum("eqd,eqid,eq->ei", gphi, t.gradphi, f)
    r_phi += jnp.einsum("eq,qi,eq->ei", coef * (cp - cm), t.shape, f)
    r_cp = jnp.einsum("eqd,eqid,eq->ei", gcp, t.gradphi, f)
    r_cp -= jnp.einsum("eq,eqi,eq->ei", cp, adv, f)
    r_cm = jnp.einsum("eqd,eqid,eq->ei", gcm, t.gradphi, f)
    r_cm += jnp.einsum("eq,eqi,eq->ei", cm, adv, f)
    return jnp.concatenate([r_phi, r_cp, r_cm], axis=1)


def pnp_jacobian_el(ue, t: VolumeTables, l_b, cylindrical, pi):
    return map_table_chunks(
        lambda tc, u: _pnp_jacobian(u, tc, l_b, cylindrical, pi), t, (ue,))


def _pnp_jacobian(ue, t: VolumeTables, l_b, cylindrical, pi):
    phie, cpe, cme = split_el(ue)
    f = qfactor(t, cylindrical, pi)
    cp = interp(cpe, t.shape)
    cm = interp(cme, t.shape)
    gphi = interp_grad(phie, t.gradphi)
    adv = jnp.einsum("eqd,eqid->eqi", gphi, t.gradphi)       # (E, nq, n)
    coef = 4.0 * pi * l_b

    K = stiffness_matrix(t, f)
    M = mass_matrix(t, f)

    # species blocks: d/d(phi_j) of the advective term is a c-weighted
    # stiffness kernel; d/d(c_j) adds shape-weighted advection
    J_cp_phi = -jnp.einsum("eq,eqid,eqjd->eij", f * cp, t.gradphi, t.gradphi)
    J_cm_phi = jnp.einsum("eq,eqid,eqjd->eij", f * cm, t.gradphi, t.gradphi)
    J_cp_cp = K - jnp.einsum("eq,eqi,qj->eij", f, adv, t.shape)
    J_cm_cm = K + jnp.einsum("eq,eqi,qj->eij", f, adv, t.shape)

    row_phi = jnp.concatenate([K, coef * M, -coef * M], axis=2)
    row_cp = jnp.concatenate([J_cp_phi, J_cp_cp, jnp.zeros_like(K)], axis=2)
    row_cm = jnp.concatenate([J_cm_phi, jnp.zeros_like(K), J_cm_cm], axis=2)
    return jnp.concatenate([row_phi, row_cp, row_cm], axis=1)


def pnp_mass_residual_el(ue, t: VolumeTables, tau, cylindrical, pi):
    return map_table_chunks(
        lambda tc, u: _pnp_mass_residual(u, tc, tau, cylindrical, pi),
        t, (ue,))


def _pnp_mass_residual(ue, t: VolumeTables, tau, cylindrical, pi):
    _, cpe, cme = split_el(ue)
    f = qfactor(t, cylindrical, pi)
    cp = interp(cpe, t.shape)
    cm = interp(cme, t.shape)
    r_cp = tau * jnp.einsum("eq,qi,eq->ei", cp, t.shape, f)
    r_cm = tau * jnp.einsum("eq,qi,eq->ei", cm, t.shape, f)
    return jnp.concatenate([jnp.zeros_like(r_cp), r_cp, r_cm], axis=1)


def pnp_mass_jacobian_el(t: VolumeTables, tau, cylindrical, pi):
    return map_table_chunks(
        lambda tc: _pnp_mass_jacobian(tc, tau, cylindrical, pi), t)


def _pnp_mass_jacobian(t: VolumeTables, tau, cylindrical, pi):
    M = mass_matrix(t, qfactor(t, cylindrical, pi)) * tau
    Z = jnp.zeros_like(M)
    row_phi = jnp.concatenate([Z, Z, Z], axis=2)
    row_cp = jnp.concatenate([Z, M, Z], axis=2)
    row_cm = jnp.concatenate([Z, Z, M], axis=2)
    return jnp.concatenate([row_phi, row_cp, row_cm], axis=1)

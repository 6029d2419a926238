"""Operator kernels: analytic Jacobians vs jax.jacfwd of the residuals.

The reference gets element Jacobians by finite differencing
(NumericalJacobian* mixins, src/pb_operator.hh:24-27); we hand-derive them
and prove consistency with forward-mode AD here (SURVEY.md section 7 test
strategy item b).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.fem.geometry import build_volume_tables
from pnp_tpu.operators import volume as V
from pnp_tpu.operators import pnp as P
from tests.test_fem_core import unit_square_mesh

PI = np.pi


@pytest.fixture(scope="module")
def setup():
    mesh = unit_square_mesh()
    space = FunctionSpace(mesh, 2)
    t = build_volume_tables(space, 4)
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.uniform(-1, 1, space.ndof))
    return space, t, u


def _check(residual_el, jacobian_el, ue):
    """Compare analytic element Jacobian to jacfwd of the element residual."""
    J_ad = jax.vmap(jax.jacfwd(lambda x: residual_el(x[None])[0]))(ue)
    J_an = jacobian_el()
    np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                               rtol=1e-12, atol=1e-12)


def test_pb_jacobian(setup):
    space, t, u = setup
    ue = u[t.dofmap]
    J_ad = jax.jacfwd(lambda x: V.pb_residual_el(x, t, 1.0, 0.06, True, PI))(ue)
    # extract block-diagonal (element e wrt its own dofs)
    J_ad = jnp.stack([J_ad[e, :, e, :] for e in range(2)])
    J_an = V.pb_jacobian_el(ue, t, 1.0, 0.06, True, PI)
    np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad), rtol=1e-12, atol=1e-12)


def test_drift_diffusion_jacobian(setup):
    space, t, u = setup
    rng = np.random.RandomState(1)
    phi = jnp.asarray(rng.uniform(-1, 1, space.ndof))
    from pnp_tpu.operators.common import interp_grad
    gphi = interp_grad(phi[t.dofmap], t.gradphi)
    ce = u[t.dofmap]
    for z in (1.0, -1.0):
        J_ad = jax.jacfwd(
            lambda x: V.drift_diffusion_residual_el(x, gphi, t, z))(ce)
        J_ad = jnp.stack([J_ad[e, :, e, :] for e in range(2)])
        J_an = V.drift_diffusion_jacobian_el(gphi, t, z)
        np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                                   rtol=1e-12, atol=1e-12)


def test_mass_jacobian(setup):
    space, t, u = setup
    ce = u[t.dofmap]
    J_ad = jax.jacfwd(lambda x: V.mass_residual_el(x, t, 1.0))(ce)
    J_ad = jnp.stack([J_ad[e, :, e, :] for e in range(2)])
    np.testing.assert_allclose(np.asarray(V.mass_jacobian_el(t, 1.0)),
                               np.asarray(J_ad), rtol=1e-12, atol=1e-12)


def test_poisson_jacobian(setup):
    space, t, u = setup
    rng = np.random.RandomState(2)
    cpe = jnp.asarray(rng.uniform(0, 1, space.ndof))[t.dofmap]
    cme = jnp.asarray(rng.uniform(0, 1, space.ndof))[t.dofmap]
    ue = u[t.dofmap]
    J_ad = jax.jacfwd(
        lambda x: V.poisson_residual_el(x, cpe, cme, t, 1.0, True, PI))(ue)
    J_ad = jnp.stack([J_ad[e, :, e, :] for e in range(2)])
    np.testing.assert_allclose(np.asarray(V.poisson_jacobian_el(t, True, PI)),
                               np.asarray(J_ad), rtol=1e-12, atol=1e-12)


def test_pnp_jacobian(setup):
    space, t, u = setup
    rng = np.random.RandomState(3)
    big = jnp.asarray(rng.uniform(-0.5, 0.5, 3 * space.ndof))
    cmap = P.composite_dofmap(t.dofmap, space.ndof)
    ue = big[cmap]
    J_ad = jax.jacfwd(lambda x: P.pnp_residual_el(x, t, 1.0, True, PI))(ue)
    J_ad = jnp.stack([J_ad[e, :, e, :] for e in range(2)])
    J_an = P.pnp_jacobian_el(ue, t, 1.0, True, PI)
    np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                               rtol=1e-12, atol=1e-12)


def test_pnp_mass_jacobian(setup):
    space, t, u = setup
    rng = np.random.RandomState(4)
    big = jnp.asarray(rng.uniform(-0.5, 0.5, 3 * space.ndof))
    cmap = P.composite_dofmap(t.dofmap, space.ndof)
    ue = big[cmap]
    tau = 0.7
    J_ad = jax.jacfwd(lambda x: P.pnp_mass_residual_el(x, t, tau, True, PI))(ue)
    J_ad = jnp.stack([J_ad[e, :, e, :] for e in range(2)])
    J_an = P.pnp_mass_jacobian_el(t, tau, True, PI)
    np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                               rtol=1e-12, atol=1e-12)

"""Element-chunked kernel dispatch parity (operators/common.py).

The level-3 (367k-element) compile OOM fix (VERDICT r3 item 1) routes
every volume kernel through map_element_chunks; chunking must be
value-identical to the direct call at ANY chunk size, including chunk
sizes that do not divide E (zero-padded tail elements are sliced off).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pnp_tpu.operators.common as OC
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.fem.geometry import build_volume_tables
from pnp_tpu.meshio.structured import rect_mesh
from pnp_tpu.operators import volume as V
from pnp_tpu.operators import pnp as P
from pnp_tpu.operators.common import interp_grad


@pytest.fixture(scope="module")
def setup():
    mesh = rect_mesh(16, 16, 1.0, 1.0)
    space = FunctionSpace(mesh, 1)
    vt = build_volume_tables(space, 3)
    rng = np.random.RandomState(7)
    u = jnp.asarray(rng.standard_normal(space.ndof))
    return space, vt, u


def _kernel_outputs(vt, u, dofmap):
    ue = u[dofmap]
    gphi = interp_grad(ue, vt.gradphi)
    ue3 = jnp.concatenate([ue, 0.5 * ue + 1.0, -0.3 * ue + 1.0], axis=1)
    return {
        "pb_res": V.pb_residual_el(ue, vt, 0.7, 1e-3, True, np.pi),
        "pb_jac": V.pb_jacobian_el(ue, vt, 0.7, 1e-3, True, np.pi),
        "poisson_res": V.poisson_residual_el(ue, 0.5 * ue, 0.3 * ue, vt,
                                             0.7, True, np.pi),
        "poisson_jac": V.poisson_jacobian_el(vt, True, np.pi),
        "laplace_res": V.laplace_residual_el(ue, vt),
        "laplace_jac": V.laplace_jacobian_el(vt),
        "dd_res": V.drift_diffusion_residual_el(ue, gphi, vt, -1.0),
        "dd_jac": V.drift_diffusion_jacobian_el(gphi, vt, +1.0),
        "mass_res": V.mass_residual_el(ue, vt, 2.0, True, np.pi),
        "mass_jac": V.mass_jacobian_el(vt, 2.0, True, np.pi),
        "pnp_res": P.pnp_residual_el(ue3, vt, 0.7, True, np.pi),
        "pnp_jac": P.pnp_jacobian_el(ue3, vt, 0.7, True, np.pi),
        "pnp_mres": P.pnp_mass_residual_el(ue3, vt, 0.1, True, np.pi),
        "pnp_mjac": P.pnp_mass_jacobian_el(vt, 0.1, True, np.pi),
    }


def test_chunked_matches_direct(setup, monkeypatch):
    space, vt, u = setup
    E = vt.num_elements
    direct = _kernel_outputs(vt, u, vt.dofmap)
    # chunk size 7 does not divide E -> exercises the zero-pad tail
    assert E % 7 != 0 and E > 7
    monkeypatch.setattr(OC, "_ELEM_CHUNK", 7)
    chunked = _kernel_outputs(vt, u, vt.dofmap)
    for k in direct:
        # identical math per element; XLA vectorizes the chunked body
        # differently -> FP reassociation noise only (observed ~1e-20)
        a, b = np.asarray(direct[k]), np.asarray(chunked[k])
        np.testing.assert_allclose(a, b, rtol=1e-12,
                                   atol=1e-14 * max(np.abs(a).max(), 1.0),
                                   err_msg=k)


def test_map_element_chunks_shapes():
    # non-divisible chunking, multi-output pytree, >1 output rank
    E = 23
    a = jnp.arange(E * 3, dtype=jnp.float64).reshape(E, 3)
    out1, out2 = OC.map_element_chunks(
        lambda x: (x * 2.0, jnp.einsum("ei,ej->eij", x, x)), (a,), chunk=5)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(a) * 2.0)
    assert out2.shape == (E, 3, 3)
    np.testing.assert_allclose(
        np.asarray(out2), np.einsum("ei,ej->eij", np.asarray(a),
                                    np.asarray(a)))

"""Pallas fused PB element kernel vs the reference jnp path (interpret
mode on CPU; the same kernel compiles on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.fem.geometry import build_volume_tables
from pnp_tpu.meshio.structured import rect_mesh
from pnp_tpu.operators import volume as V
from pnp_tpu.operators.pallas_kernels import (
    pb_residual_jacobian_pallas, pad_to_tile, ELEM_TILE)


@pytest.mark.parametrize("cylindrical", [False, True])
def test_pb_pallas_matches_jnp(cylindrical):
    mesh = rect_mesh(20, 16, 2.0, 1.0, y0=0.1)
    space = FunctionSpace(mesh, 1)
    vt = build_volume_tables(space, 3)
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.uniform(-1, 1, space.ndof))
    ue = u[vt.dofmap]
    l_b, c0, pi = 1.0, 0.06, np.pi

    r_ref = V.pb_residual_el(ue, vt, l_b, c0, cylindrical, pi)
    A_ref = V.pb_jacobian_el(ue, vt, l_b, c0, cylindrical, pi)

    E = ue.shape[0]
    r, A = pb_residual_jacobian_pallas(
        pad_to_tile(ue), jnp.asarray(vt.shape),
        pad_to_tile(vt.gradphi), pad_to_tile(vt.qw), pad_to_tile(vt.qy),
        l_b, c0, cylindrical, pi, interpret=True)
    np.testing.assert_allclose(np.asarray(r[:E]), np.asarray(r_ref),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(A[:E]), np.asarray(A_ref),
                               rtol=1e-13, atol=1e-13)
    # padded rows contribute exactly zero
    np.testing.assert_array_equal(np.asarray(r[E:]), 0.0)


def test_pad_to_tile():
    x = jnp.ones((ELEM_TILE + 3, 2))
    y = pad_to_tile(x)
    assert y.shape[0] == 2 * ELEM_TILE
    assert float(y[ELEM_TILE + 3:].sum()) == 0.0


@pytest.mark.parametrize("S,N", [(2, 128), (2, 300), (1, 40)])
def test_batched_inverse_pallas(S, N):
    """Blocked in-block-pivoted Gauss-Jordan vs f64 inverse (interpret).

    Accuracy bar is f32-LU-level (~1e-6 residual on well-conditioned
    operands) — the production use is a refinement preconditioner
    (solvers/direct.py), where only the contraction rate matters."""
    from pnp_tpu.operators.pallas_kernels import batched_inverse_pallas

    rng = np.random.RandomState(0)
    A = (rng.rand(S, N, N).astype(np.float32) * 0.1
         + np.eye(N, dtype=np.float32)[None] * N * 0.05)
    X = np.asarray(batched_inverse_pallas(jnp.asarray(A), interpret=True),
                   np.float64)
    resid = np.einsum("sij,sjk->sik", np.asarray(A, np.float64), X)
    resid -= np.eye(N)
    assert np.max(np.abs(resid)) < 5e-6


def test_batched_inverse_pallas_needs_pivoting():
    """A row-permuted diagonally-dominant matrix (near-zero diagonal
    pivots everywhere) is fatal for no-pivot elimination; the in-block
    partial pivoting keeps the inverse finite and preconditioner-grade.
    This is the regression pin for the late-transient advective stage
    failure (tools/gj_pivot_study.py)."""
    from pnp_tpu.operators.pallas_kernels import batched_inverse_pallas

    rng = np.random.RandomState(1)
    N = 256
    A0 = (np.eye(N, dtype=np.float32) * 8
          + rng.standard_normal((N, N)).astype(np.float32))
    P = np.eye(N, dtype=np.float32)[rng.permutation(N)]
    A = jnp.asarray((P @ A0).astype(np.float32))[None]
    X = np.asarray(batched_inverse_pallas(A, interpret=True), np.float64)
    assert np.isfinite(X).all()
    resid = X @ np.asarray(A[0], np.float64) - np.eye(N)
    assert np.max(np.abs(resid)) < 1e-2


def test_batched_inverse_pallas_hardware_tpu():
    """Hardware-lowering smoke (ADVICE r1): compiles interpret=False on a
    real TPU and checks ||inv*A - I||. Skipped under the CPU-forced CI
    (tools/tpu_pallas_check.py is the runnable hardware script; last
    verified 2026-08-20 on jax 0.9.0 Mosaic)."""
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("needs TPU hardware (CI forces CPU)")
    from pnp_tpu.operators.pallas_kernels import batched_inverse_pallas
    rng = np.random.RandomState(0)
    N = 512
    A = jnp.asarray(np.eye(N, dtype=np.float32)[None] * 64.0
                    + rng.standard_normal((3, N, N)).astype(np.float32))
    out = batched_inverse_pallas(A)
    err = float(jnp.max(jnp.abs(
        jnp.einsum("sij,sjk->sik", out, A,
                   precision=jax.lax.Precision.HIGHEST)
        - jnp.eye(N)[None])))
    assert err < 1e-4, err

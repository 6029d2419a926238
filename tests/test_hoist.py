"""Huge-mesh closure-constant hoisting (utils/hoist.py).

The remote TPU compiler ships jit closure constants in the compile
request; at the 1.47M-element level-4 pore the element tables alone
exceed its body-size limit (HTTP 413 — CLAUDE.md r3/r4 lesson). Above
``PNP_TPU_HOIST_ELEMS`` elements every production program hoists its
captured arrays to runtime arguments. These tests force the hoisted
path on the small pore mesh and pin (a) unit-level equivalence of
``jit_hoisted`` and (b) production trajectory parity through the
block-RAS pipeline in the presolved regime (the un-presolved transient
amplifies the 1e-10 iterative-solve slack chaotically — same class as
the golden-snapshot slack, tests/test_golden.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.utils.hoist import hoist_needed, jit_hoisted


def test_jit_hoisted_matches_jit_and_hoists_consts():
    big = jnp.arange(12.0, dtype=jnp.float64).reshape(3, 4)
    off = jnp.ones((3,))

    def f(x, aux=None):
        y = big @ x + off[:, None]
        if aux is not None:
            y = y + aux[0]
        return y * 2.0, y.sum()

    args = (jnp.full((4, 2), 1.5), (jnp.full((), 0.25),))
    hoisted = jit_hoisted(f)
    out = hoisted(*args)
    ref = f(*args)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]))
    assert float(out[1]) == pytest.approx(float(ref[1]))
    # None-bearing pytree arg structure retraces and still matches
    out2 = hoisted(args[0], None)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(f(args[0])[0]))


def test_hoist_threshold_env(monkeypatch):
    assert not hoist_needed(367_616)        # level 3 stays closure-jit
    assert hoist_needed(1_470_464)          # level 4 hoists
    monkeypatch.setenv("PNP_TPU_HOIST_ELEMS", "10")
    assert hoist_needed(11)


def test_hoisted_production_trajectory_parity(ref_test_dir, monkeypatch):
    """Force hoisting on the pore mesh: the block-RAS production
    pipeline (PB Newton, setup, stage solves, Poisson passes, factor
    reuse, scan driver) must reproduce the closure-jit trajectory."""
    from pnp_tpu.config import read_config
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg = read_config(str(ref_test_dir / "pore_pnp/pore.cfg"))
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    sys_a = build_pnp_system(cfg, space, dense_poisson_threshold=0,
                             poisson_inv_threshold=0)
    monkeypatch.setenv("PNP_TPU_HOIST_ELEMS", "1")
    sys_b = build_pnp_system(cfg, space, dense_poisson_threshold=0,
                             poisson_inv_threshold=0, pb_field=sys_a.pb)
    s = (sys_a.uphi0, sys_a.ucp0, sys_a.ucm0)
    uphi, _ = sys_a.poisson_solve(*s)
    sa = sb = (uphi, s[1], s[2])
    for _ in range(3):
        sa = sys_a.fused_step(*sa)
        sb = sys_b.fused_step(*sb)
    for a, b in zip(sa, sb):
        assert bool(jnp.isfinite(b).all())
        scale = float(jnp.max(jnp.abs(a))) + 1.0
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-4
    # factor-reuse + scan surfaces of the hoisted system stay healthy
    factor = sys_b.species_factor(sb[0])
    _, _, its = sys_b.species_step_reuse(factor, *sb)
    assert int(its) > 0
    st = sys_b.scan_steps(sb, 2)
    assert bool(jnp.isfinite(st[0]).all())


def test_pb_split_factor_parity(ref_test_dir, monkeypatch):
    """Level-4 PB path: with hoisting forced, the assemble/invert split
    (workloads/pb.py) must reproduce the fused-factor Newton step."""
    from pnp_tpu.config import read_config
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.common import make_scalar_context
    from pnp_tpu.workloads.pb import make_pb_assemble_solve, make_pb_residual

    cfg = read_config(str(ref_test_dir / "pore_pnp/pore.cfg"))
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    ctx = make_scalar_context(cfg, space, component=0, quad_order=3)
    # ras_threshold=0 engages block-RAS on the 3048-dof mesh
    asm_a, solve_a = make_pb_assemble_solve(ctx, ras_threshold=0)
    monkeypatch.setenv("PNP_TPU_HOIST_ELEMS", "1")
    asm_b, solve_b = make_pb_assemble_solve(ctx, ras_threshold=0)

    residual = make_pb_residual(ctx)
    u = jnp.where(ctx.free, 0.0, ctx.dirichlet)
    r = residual(u)
    xa, ita = solve_a(asm_a(u), r, 1e-8)
    xb, itb = solve_b(asm_b(u), r, 1e-8)
    assert bool(jnp.isfinite(xb).all())
    scale = float(jnp.max(jnp.abs(xa))) + 1e-30
    assert float(jnp.max(jnp.abs(xa - xb))) / scale < 1e-6

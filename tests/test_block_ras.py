"""Single-device overlapping block-RAS preconditioner (solvers/block_ras.py).

The large-mesh stand-in for the reference's SSOR-preconditioned solvers
(src/instationary_pnp_from_pb_md.hh:188-211): exactness on one block,
fixed-point contraction, iteration-count superiority over Jacobi on both
elliptic and advection-dominated systems, batched parity, and the
production-driver large-mesh path reproducing the dense-path trajectory.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pnp_tpu.fem import assembly as FA
from pnp_tpu.fem.geometry import build_volume_tables
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio.structured import rect_mesh
from pnp_tpu.operators import volume as V
from pnp_tpu.solvers import block_ras as BR
from pnp_tpu.solvers.krylov import bicgstab, cg
from pnp_tpu.solvers.precond import jacobi_precond


@pytest.fixture(scope="module")
def laplace_problem():
    mesh = rect_mesh(40, 40, 1.0, 1.0)
    space = FunctionSpace(mesh, 1)
    vt = build_volume_tables(space, 2)
    A_el = V.laplace_jacobian_el(vt)
    onb = np.zeros(space.ndof, bool)
    onb[np.unique(mesh.edges)] = True
    free = jnp.asarray(~onb)
    op = FA.make_constrained_operator(A_el, vt.dofmap, space.ndof, free)
    b = jnp.where(free, jnp.ones(space.ndof), 0.0)
    return space, vt, A_el, free, op, b


def test_single_block_is_exact(laplace_problem):
    space, vt, A_el, free, op, b = laplace_problem
    ctx = BR.build_block_context_for_space(space, block_size=space.ndof)
    assert ctx.K == 1
    inv = BR.build_local_inverses(ctx, A_el, free)
    M = BR.make_ras_precond(ctx, inv, free)
    z = M(b)
    # one block == the full constrained matrix: M is its (f32) inverse,
    # accurate to kappa(A) * eps_f32
    err = float(jnp.linalg.norm(op(z) - b) / jnp.linalg.norm(b))
    assert err < 1e-3


def test_richardson_contracts():
    """RAS is a convergent fixed-point iteration (no Krylov) when the
    block count is moderate — the divergence mode of partially-assembled
    overlap rows (floating Neumann local matrices) would explode here."""
    mesh = rect_mesh(10, 10, 1.0, 1.0)
    space = FunctionSpace(mesh, 1)
    vt = build_volume_tables(space, 2)
    A_el = V.laplace_jacobian_el(vt)
    onb = np.zeros(space.ndof, bool)
    onb[np.unique(mesh.edges)] = True
    free = jnp.asarray(~onb)
    op = FA.make_constrained_operator(A_el, vt.dofmap, space.ndof, free)
    b = jnp.where(free, jnp.ones(space.ndof), 0.0)
    ctx = BR.build_block_context_for_space(space, block_size=24)
    assert ctx.K > 4
    inv = BR.build_local_inverses(ctx, A_el, free)
    M = BR.make_ras_precond(ctx, inv, free)
    x = jnp.zeros(space.ndof)
    n0 = float(jnp.linalg.norm(b))
    for _ in range(10):
        x = x + M(jnp.where(free, b - op(x), 0.0))
    assert float(jnp.linalg.norm(jnp.where(free, b - op(x), 0.0))) < 0.05 * n0


def test_ras_beats_jacobi_elliptic(laplace_problem):
    space, vt, A_el, free, op, b = laplace_problem
    d = FA.constrained_diagonal(A_el, vt.dofmap, space.ndof, free)
    res_j = bicgstab(op, b, jnp.zeros(space.ndof), jacobi_precond(d),
                     1e-10, 2000)
    ctx = BR.build_block_context_for_space(space, block_size=128)
    inv = BR.build_local_inverses(ctx, A_el, free)
    M = BR.make_ras_precond(ctx, inv, free)
    res_r = bicgstab(op, b, jnp.zeros(space.ndof), M, 1e-10, 2000)
    assert bool(res_r.converged)
    tr = float(jnp.linalg.norm(b - op(res_r.x)) / jnp.linalg.norm(b))
    assert tr < 1e-9
    assert int(res_r.iterations) < 0.6 * int(res_j.iterations)
    # two-level: coarse correction reduces iterations further
    cinv = BR.build_coarse_inverse(ctx, A_el, vt.dofmap, free)
    M2 = BR.make_two_level_precond(ctx, inv, cinv, op, free)
    res_2 = bicgstab(op, b, jnp.zeros(space.ndof), M2, 1e-10, 2000)
    assert bool(res_2.converged)
    assert int(res_2.iterations) <= int(res_r.iterations)


def test_ras_advective_and_batched(laplace_problem):
    """Advection-dominated stage-like systems (the production stress case),
    solved per-system and as a (2, ndof) batch."""
    space, vt, A_el, free, op, b = laplace_problem
    gphi = jnp.broadcast_to(jnp.asarray([40.0, 25.0]),
                            vt.gradphi.shape[:2] + (2,))
    M_el = V.mass_jacobian_el(vt, 1.0, False, np.pi)
    A_pair = jnp.stack([
        M_el + V.drift_diffusion_jacobian_el(gphi, vt, +1.0, False, np.pi),
        M_el + V.drift_diffusion_jacobian_el(gphi, vt, -1.0, False, np.pi)])
    fp = jnp.stack([free, free])
    opb = FA.make_constrained_operator_batched(A_pair, vt.dofmap, space.ndof,
                                               fp)
    ctx = BR.build_block_context_for_space(space, block_size=128)
    invb = BR.build_local_inverses(ctx, A_pair, fp)
    Mb = BR.make_ras_precond(ctx, invb, fp)
    bb = jnp.stack([b, b])
    res = bicgstab(opb, bb, jnp.zeros_like(bb), Mb, 1e-8, 2000)
    assert bool(res.converged)
    tr = jnp.linalg.norm(bb - opb(res.x), axis=-1) / jnp.linalg.norm(
        bb, axis=-1)
    assert float(jnp.max(tr)) < 1e-7
    assert int(res.iterations) < 60

    # batched solve == per-system solves
    op0 = FA.make_constrained_operator(A_pair[0], vt.dofmap, space.ndof, free)
    inv0 = BR.build_local_inverses(ctx, A_pair[0], free)
    M0 = BR.make_ras_precond(ctx, inv0, free)
    r0 = bicgstab(op0, b, jnp.zeros(space.ndof), M0, 1e-8, 2000)
    assert np.allclose(np.asarray(r0.x), np.asarray(res.x[0]), atol=1e-7)


def test_p1_coarse_quadratic_modes(laplace_problem):
    """6-mode (quadratic) per-block coarse space: correct solves and an
    iteration count no worse than the 3-mode linear coarse on the
    elliptic operator (the r4-roadmap 'stronger coarse' candidate for
    the L3 Poisson's 48-iteration solves)."""
    space, vt, A_el, free, op, b = laplace_problem
    ctx = BR.build_block_context_for_space(space, block_size=128)
    inv = BR.build_local_inverses(ctx, A_el, free)
    its = {}
    for m in (3, 6):
        p1 = BR.build_p1_coarse(ctx, A_el, vt.dofmap, free,
                                space.dof_coords, n_modes=m)
        assert p1[0].shape == (m * ctx.K, m * ctx.K)
        M2 = BR.make_two_level_precond(ctx, inv, None, op, free, p1_coarse=p1)
        res = bicgstab(op, b, jnp.zeros(space.ndof), M2, 1e-10, 2000)
        assert bool(res.converged)
        tr = float(jnp.linalg.norm(b - op(res.x)) / jnp.linalg.norm(b))
        assert tr < 1e-9
        its[m] = int(res.iterations)
    assert its[6] <= its[3]


def test_symmetric_variant_with_cg(laplace_problem):
    """restricted=False (symmetric additive Schwarz) keeps CG convergent."""
    space, vt, A_el, free, op, b = laplace_problem
    ctx = BR.build_block_context_for_space(space, block_size=128)
    inv = BR.build_local_inverses(ctx, A_el, free)
    M = BR.make_ras_precond(ctx, inv, free, restricted=False)
    res = cg(op, b, jnp.zeros(space.ndof), M, 1e-10, 2000)
    assert bool(res.converged)
    tr = float(jnp.linalg.norm(b - op(res.x)) / jnp.linalg.norm(b))
    assert tr < 1e-9


def test_driver_large_mesh_path_matches_dense(ref_test_dir):
    """Forcing the iterative path (dense_poisson_threshold=0) routes the
    production pipeline through block-RAS and reproduces the dense-path
    trajectory within stage-tolerance slack (CLAUDE.md: 1e-5 stage solves
    leave ~1e-3 slack; the first post-bias steps amplify)."""
    from pnp_tpu.config import read_config
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg = read_config(str(ref_test_dir / "pore_pnp/pore.cfg"))
    cfg.linearSolverIterations = 3000
    mesh = read_gmsh(cfg.meshfile)
    space = FunctionSpace(mesh, 1)
    sys_d = build_pnp_system(cfg, space)
    sys_r = build_pnp_system(cfg, space, dense_poisson_threshold=0,
                             poisson_inv_threshold=0, pb_field=sys_d.pb)
    # presolved regime (tamed transient): trajectories must track closely
    sd = (sys_d.uphi0, sys_d.ucp0, sys_d.ucm0)
    uphi, _ = sys_d.poisson_solve(*sd)
    sd = (uphi, sd[1], sd[2])
    sr = sd
    for _ in range(3):
        sd = sys_d.fused_step(*sd)
        sr = sys_r.fused_step(*sr)
    for a, b2 in zip(sd, sr):
        assert bool(jnp.isfinite(b2).all())
        scale = float(jnp.max(jnp.abs(a))) + 1.0
        assert float(jnp.max(jnp.abs(a - b2))) / scale < 2e-4


def test_mixed_precision_large_mesh_matches_f64(ref_test_dir):
    """VERDICT r1 item 10: f32-SpMV/f64-reduction Krylov with two-pass
    refinement must reproduce the f64 iterative path — the Poisson
    re-solve is checked at its 1e-10 tolerance (same state, same linear
    system, both solved 'exactly' -> answers agree far below 1e-8), the
    stage trajectory within stage-tolerance slack."""
    from pnp_tpu.config import read_config
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg = read_config(str(ref_test_dir / "pore_pnp/pore.cfg"))
    cfg.linearSolverIterations = 3000
    mesh = read_gmsh(cfg.meshfile)
    space = FunctionSpace(mesh, 1)
    sys_r = build_pnp_system(cfg, space, dense_poisson_threshold=0,
                             poisson_inv_threshold=0)
    sys_m = build_pnp_system(cfg, space, dense_poisson_threshold=0,
                             poisson_inv_threshold=0,
                             pb_field=sys_r.pb, mixed_precision=True)
    s = (sys_r.uphi0, sys_r.ucp0, sys_r.ucm0)

    # the 1e-10 Poisson solve: same state, same system -> same answer
    phi_r, _ = sys_r.poisson_solve(*s)
    phi_m, its_m = sys_m.poisson_solve(*s)
    scale = float(jnp.max(jnp.abs(phi_r))) + 1.0
    assert float(jnp.max(jnp.abs(phi_r - phi_m))) / scale < 1e-8
    assert int(its_m) < cfg.linearSolverIterations

    # short trajectory: mixed ops perturb each stage solve at ~f32 level,
    # within the 1e-5 stage-tolerance slack budget
    sr = sm = (phi_r, s[1], s[2])
    for _ in range(2):
        sr = sys_r.fused_step(*sr)
        sm = sys_m.fused_step(*sm)
    for a, b in zip(sr, sm):
        assert bool(jnp.isfinite(b).all())
        scale = float(jnp.max(jnp.abs(a))) + 1.0
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-4


def test_ras_factor_reuse_trajectory(ref_test_dir):
    """ras_refresh_every > 1 amortizes the RAS local factorization across
    steps; stale factors only raise Krylov counts, so the trajectory must
    track the fresh-factor run within stage-tolerance slack."""
    from pnp_tpu.config import read_config
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import (
        run_instationary_pnp_from_pb)

    cfg = read_config(str(ref_test_dir / "pore_pnp/pore.cfg"))
    cfg.linearSolverIterations = 3000
    mesh = read_gmsh(cfg.meshfile)
    space = FunctionSpace(mesh, 1)
    base = run_instationary_pnp_from_pb(
        cfg, space, n_steps=4, dense_poisson_threshold=0,
        poisson_inv_threshold=0, presolve_potential=True,
        ras_refresh_every=1)   # fresh factors (the driver default is now 4)
    reuse = run_instationary_pnp_from_pb(
        cfg, space, n_steps=4, dense_poisson_threshold=0,
        poisson_inv_threshold=0, presolve_potential=True,
        ras_refresh_every=4)
    for a, b in zip((base.phi, base.cp, base.cm),
                    (reuse.phi, reuse.cp, reuse.cm)):
        assert bool(jnp.isfinite(b).all())
        scale = float(jnp.max(jnp.abs(a))) + 1.0
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-4


def test_poisson_inv_tier_matches_exact(ref_test_dir):
    """Mid-size constant-Poisson f32-inverse tier (poisson_inv_threshold):
    the refinement-based 1e-10 re-solve must agree with the dense-path
    exact affine solve far below 1e-8 (same state, same linear system)."""
    from pnp_tpu.config import read_config
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg = read_config(str(ref_test_dir / "pore_pnp/pore.cfg"))
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    sys_d = build_pnp_system(cfg, space)                 # exact affine path
    sys_t = build_pnp_system(cfg, space, dense_poisson_threshold=0,
                             pb_field=sys_d.pb)          # tier engages
    s = (sys_d.uphi0, sys_d.ucp0, sys_d.ucm0)
    phi_d, _ = sys_d.poisson_solve(*s)
    phi_t, its = sys_t.poisson_solve(*s)
    scale = float(jnp.max(jnp.abs(phi_d))) + 1.0
    assert float(jnp.max(jnp.abs(phi_d - phi_t))) / scale < 1e-8
    assert int(its) < 40, "refinement saturating"


def test_species_two_level_parity(ref_test_dir):
    """Two-level species RAS (batched p1 coarse, species_two_level): the
    stage solves stay 1e-5-exact, so the step output must match the
    one-level path within stage-tolerance slack; iteration counts must
    not blow up (the real 1/H win is measured on TPU at 46k nodes —
    tools/tpu_scaled_e2e.py)."""
    from pnp_tpu.config import read_config
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg = read_config(str(ref_test_dir / "pore_pnp/pore.cfg"))
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    sys_1 = build_pnp_system(cfg, space, dense_poisson_threshold=0,
                             poisson_inv_threshold=0,
                             species_two_level=False)
    sys_2 = build_pnp_system(cfg, space, dense_poisson_threshold=0,
                             poisson_inv_threshold=0, pb_field=sys_1.pb,
                             species_two_level=True)
    s = (sys_1.uphi0, sys_1.ucp0, sys_1.ucm0)
    uphi, _ = sys_1.poisson_solve(*s)
    cp1, cm1, it1 = sys_1.species_step(uphi, s[1], s[2])
    cp2, cm2, it2 = sys_2.species_step(uphi, s[1], s[2])
    for a, b in ((cp1, cp2), (cm1, cm2)):
        assert bool(jnp.isfinite(b).all())
        scale = float(jnp.max(jnp.abs(a))) + 1.0
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4
    assert int(it2) <= int(it1) * 2, (int(it1), int(it2))
    # the reuse path carries the (inv, p1) tuple factor end-to-end
    f = sys_2.species_factor(uphi)
    cp3, cm3, it3 = sys_2.species_step_reuse(f, uphi, s[1], s[2])
    scale = float(jnp.max(jnp.abs(cp2))) + 1.0
    assert float(jnp.max(jnp.abs(cp3 - cp2))) / scale < 1e-4


def test_block_context_vectorized_matches_reference_algorithm():
    """The r4 vectorized build_block_context (group-by + membership join;
    the old per-entry python loops took ~5 min at the 1.47M-element
    level-4 mesh) must reproduce the r3 reference algorithm EXACTLY —
    the block decomposition determines solver trajectories."""
    import numpy as np
    from pnp_tpu.solvers.block_ras import (build_block_context,
                                           morton_order, _ranges_concat)

    # reference (r3) algorithm, verbatim logic
    def reference_lists(dofmap, ndof, dof_coords, block_size):
        perm = morton_order(np.asarray(dof_coords))
        E, n = dofmap.shape
        K = max(1, -(-ndof // block_size))
        owner = np.empty(ndof, np.int32)
        bounds = np.linspace(0, ndof, K + 1).astype(np.int64)
        for k in range(K):
            owner[perm[bounds[k]:bounds[k + 1]]] = k
        eowner = owner[dofmap]
        seed_lists = [[] for _ in range(K)]
        for k_col in range(n):
            for e, k in enumerate(eowner[:, k_col]):
                seed_lists[k].append(e)
        seed_lists = [np.unique(np.array(l, np.int64)) for l in seed_lists]
        own_lists = [perm[bounds[k]:bounds[k + 1]] for k in range(K)]
        loc_lists = []
        in_loc = np.zeros((K, ndof), bool)
        for k in range(K):
            touched = np.unique(dofmap[seed_lists[k]])
            extra = np.setdiff1d(touched, own_lists[k])
            loc_lists.append(np.concatenate([own_lists[k], extra]))
            in_loc[k, loc_lists[k]] = True
        elem_lists = [np.where(in_loc[k][dofmap].any(axis=1))[0]
                      for k in range(K)]
        return loc_lists, elem_lists

    for nx, ny, bs in ((12, 9, 32), (20, 7, 48)):
        mesh = rect_mesh(nx, ny, 1.0, 1.0)
        space = FunctionSpace(mesh, 1)
        dofmap = np.asarray(space.dofmap)
        ctx = build_block_context(dofmap, space.ndof, space.dof_coords, bs)
        loc_ref, elem_ref = reference_lists(dofmap, space.ndof,
                                            space.dof_coords, bs)
        l2g = np.asarray(ctx.loc2glob)
        eids = np.asarray(ctx.elem_ids)
        edl = np.asarray(ctx.elem_dof_local)
        for k in range(ctx.K):
            own = loc_ref[k]
            got = l2g[k][l2g[k] < space.ndof]
            # loc2glob stores own at [0, B) then extra at [B, ...)
            np.testing.assert_array_equal(np.sort(got), np.sort(own))
            got_e = eids[k][(edl[k] < ctx.L).any(axis=1)]
            np.testing.assert_array_equal(np.sort(np.unique(got_e)),
                                          elem_ref[k])

    # _ranges_concat basics incl. zero segments
    np.testing.assert_array_equal(
        _ranges_concat(np.array([3, 0, 2, 1])), [0, 1, 2, 0, 1, 0])


def test_outofcore_inversion_matches_full_batch():
    """Level-4 path: huge factor batches invert in-place through the
    host-orchestrated chunked programs (XLA's whole-batch LU temps were
    21.7 GB on a 15.75 GB chip at (5766, 403, 403),
    tools/l4_probe_r5b.log). Out-of-core (incl. a remainder chunk) and
    full-batch results must agree exactly, both batched and squeezed."""
    rng = np.random.default_rng(3)
    A = rng.standard_normal((2, 11, 13, 13)).astype(np.float32)
    A = A @ A.transpose(0, 1, 3, 2) + 13.0 * np.eye(13, dtype=np.float32)
    ooc = np.asarray(BR.invert_local_matrices_outofcore(
        jnp.asarray(A), chunk=7))                      # 22 rows -> 3+rem
    full = np.asarray(BR.invert_local_matrices(jnp.asarray(A)))
    np.testing.assert_allclose(ooc, full, atol=1e-6)
    ooc3 = np.asarray(BR.invert_local_matrices_outofcore(
        jnp.asarray(A[0]), chunk=4))
    np.testing.assert_allclose(ooc3, full[0], atol=1e-6)

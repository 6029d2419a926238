"""The production workload: instationary PNP bootstrapped from a PB solve.

Parity: reference ``instationary_pnp_md``
(src/instationary_pnp_from_pb_md.hh:112-456), the one driver wired into the
shipped binary (src/pnp_solver_main.cc:116). Phases:

  A. nonlinear PB Newton solve on the coulomb BC table       (:125-228)
  B. initial (phi, c+, c-) interpolated from the PB solution:
     phi = phi_PB, c+- = c0 exp(-+ phi_PB), Dirichlet dofs from config
     (:278-331 via BCExtension, src/dirichlet_bc.hh:94-118)
  C. operators: decoupled Poisson with frozen concentrations (tol 1e-10
     SLP), per-species drift-diffusion + L2 mass with Alexander2 DIRK
     stages solved to 1e-5                                   (:343-391)
  D. time loop: c+ step, c- step, Poisson re-solve every
     potentialUpdateFreq, output + ion flux every outputFreq (:421-453),
     final Poisson solve (:454)

Reference behaviors reproduced exactly (see SURVEY.md):
  * species operators carry NO axisymmetric weight even in cylindrical
    runs (src/diffusion_operator.hh:100; PB/Poisson do carry it);
  * quadrature orders: 3 (PB/Poisson), 2 (species spatial), 5 (species
    mass, ctor arg at :363);
  * dt = tau; the potential used by the species steps is updated only at
    the potentialUpdateFreq cadence.

TPU-native structure: ``build_pnp_system`` produces jitted ``species_step``
and ``poisson_solve`` programs (optionally with element tables sharded over
a ``jax.sharding.Mesh`` — GSPMD inserts the psum collectives), plus a
``scan_steps`` fast path that fuses whole output blocks into one
``lax.scan`` when the potential-update cadence is every step.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Sysparams
from ..fem import assembly as FA
from ..fem import constraints as C
from ..fem.space import FunctionSpace
from ..fem.geometry import build_volume_tables
from ..operators import volume as V
from ..operators.common import interp_grad
from ..solvers.linear_problem import make_krylov_solver
from ..timestepping.tableaux import Tableau, alexander2
from ..postprocess.ionflux import build_ionflux_tables, calc_ion_flux
from ..io.writers import write_dat, write_vtu, CurrentWriter
from ..io.checkpoint import save_checkpoint, load_checkpoint
from .common import make_scalar_context
from .pb import solve_pb

Array = Any


@dataclasses.dataclass
class PnpSystem:
    """Compiled pipeline pieces for the instationary PNP-from-PB workload."""

    sys: Sysparams
    space: FunctionSpace
    pb: Any                      # PB bootstrap field
    pb_newton_iterations: int
    uphi0: Any
    ucp0: Any
    ucm0: Any
    species_step: Callable       # (uphi, ucp, ucm) -> (ucp', ucm', iters)
    poisson_solve: Callable      # (uphi, ucp, ucm) -> (uphi', iters)
    fused_step: Callable         # (uphi, ucp, ucm) -> (uphi', ucp', ucm')
    scan_steps: Callable         # ((uphi, ucp, ucm), n) -> (uphi', ucp', ucm')
    ionflux_tables: Any
    dt: float
    # factor-amortized species stepping (None on the sharded path):
    species_factor: Any = None       # (uphi) -> f32 stage factors
    species_step_reuse: Any = None   # (factor, uphi, ucp, ucm) -> (...)
    factor_kind: Any = None          # "dense" | "ras" | None
    # species_step_reuse + poisson_solve as ONE program (one dispatch per
    # step instead of two; XLA can overlap the tails):
    fused_step_reuse: Any = None     # (factor, uphi, ucp, ucm) -> state'


def build_pnp_system(
    sys: Sysparams,
    space: FunctionSpace,
    tableau: Optional[Tableau] = None,
    device_mesh=None,
    pb_field=None,
    dense_poisson_threshold: int = 8192,
    stage_reduction: float = 1e-5,
    ras_block_size: int = 256,
    mixed_precision: bool = False,
    poisson_inv_threshold: int = 16384,
) -> PnpSystem:
    """Compile the production pipeline.

    ``mixed_precision`` (large-mesh path only): Krylov operator applies
    run as f32 SpMV (element blocks cast once, true-f32 einsum) while
    vectors/dots stay f64; the 1e-10 Poisson solve goes through two
    1e-5 passes with an exact-f64 residual between them (classic
    mixed-precision refinement). Validated against the f64 path in
    tests/test_block_ras.py.

    ``stage_reduction``: relative tolerance of the species stage solves
    (reference: 1e-5, src/instationary_pnp_from_pb_md.hh:383-386; tighter
    values are used by golden regeneration to bound trajectory slack).

    ``dense_poisson_threshold``: the decoupled Poisson matrix is constant
    across the run, so for ndof at or below this bound its constrained
    dense inverse is precomputed once and every Poisson re-solve becomes
    one MXU matmul plus one residual-refinement pass (machine-precision
    accurate, ~100x fewer latency-bound loop ops than the Krylov path).
    Set to 0 to force the iterative path (used for very large meshes and
    by the multi-device configuration, where the dense inverse would be
    replicated).

    Above the threshold (the LARGE-MESH path) the default BCGS_SSORk
    variant maps to BiCGSTAB + overlapping block-RAS with exact f32 local
    solves (solvers/block_ras.py, block size ``ras_block_size``) — the
    TPU-native stand-in for the reference's SSOR robustness at scale
    (src/instationary_pnp_from_pb_md.hh:188-211): a two-level variant for
    the constant Poisson operator (factored once) and a per-step
    refactored one-level variant for the advection-dominated species
    stage systems.

    ``poisson_inv_threshold``: mid-size tier INSIDE the large-mesh path
    (``dense_poisson_threshold < ndof <= poisson_inv_threshold``). The
    decoupled Poisson operator is constant across the run, so its
    constrained dense f32 inverse is computed ONCE on device (one MXU
    inversion at setup; memory ndof^2 * 4 bytes gates the default) and
    every 1e-10 re-solve becomes a handful of f64-residual refinement
    passes — on TPU this replaces ~30 latency-bound BiCGSTAB iterations
    with ~5 matvec+residual rounds. Species stage systems change every
    step and stay on block-RAS. Set to 0 to force the fully iterative
    Poisson (tests of the Krylov path do).
    """
    tab = tableau if tableau is not None else alexander2()
    dt = sys.tau
    pi = sys.pi
    use_dense_poisson = (space.ndof <= dense_poisson_threshold
                         and device_mesh is None)
    use_block_ras = (device_mesh is None and not use_dense_poisson
                     and sys.linearSolver == "BCGS_SSORk")

    # ---- Phase A: PB bootstrap ------------------------------------------
    if pb_field is None:
        pb_res = solve_pb(sys, space)
        pb, pb_iters = pb_res.u, pb_res.iterations
    else:
        pb, pb_iters = pb_field, 0

    # ---- Phase B: constraints + initial fields --------------------------
    ctx_phi = make_scalar_context(sys, space, component=0, quad_order=3)
    free_cp = jnp.asarray(C.free_dof_mask(space, sys, 1))
    free_cm = jnp.asarray(C.free_dof_mask(space, sys, 2))
    g_cp = jnp.asarray(C.dirichlet_dof_values(space, sys, 1))
    g_cm = jnp.asarray(C.dirichlet_dof_values(space, sys, 2))

    uphi0 = jnp.asarray(C.interpolate_with_pb_fallback(space, sys, 0, np.asarray(pb)))
    ucp0 = jnp.asarray(C.interpolate_with_pb_fallback(space, sys, 1, np.asarray(pb)))
    ucm0 = jnp.asarray(C.interpolate_with_pb_fallback(space, sys, 2, np.asarray(pb)))

    # ---- Phase C: operators ---------------------------------------------
    # reference orders 2 (species spatial) / 5 (species mass), raised with
    # the space degree so P2/P3 are never under-integrated
    vt2 = build_volume_tables(space, max(2, 2 * space.degree))
    vt5 = build_volume_tables(space, max(5, 2 * space.degree + 1))
    vt_phi = ctx_phi.vt
    if device_mesh is not None:
        from ..parallel.sharding import shard_volume_tables
        vt2 = shard_volume_tables(vt2, device_mesh)
        vt5 = shard_volume_tables(vt5, device_mesh)
        vt_phi = shard_volume_tables(vt_phi, device_mesh)
    ndof = space.ndof

    krylov = make_krylov_solver(sys.linearSolver, sys.linearSolverIterations)
    krylov_phi = krylov_sp = krylov
    if sys.linearSolver == "CG_AMG_SSOR" and not use_dense_poisson:
        # the AMG-class variant gets real aggregation contexts on BOTH
        # iterative paths (one per constraint-mask family); the element
        # Jacobian blocks are passed at the call sites below
        from ..solvers.amg import make_amg_context
        free_cp_np = np.asarray(C.free_dof_mask(space, sys, 1))
        free_cm_np = np.asarray(C.free_dof_mask(space, sys, 2))
        krylov_phi = make_krylov_solver(
            sys.linearSolver, sys.linearSolverIterations,
            amg_ctx=make_amg_context(np.asarray(space.dofmap), space.ndof,
                                     np.asarray(ctx_phi.free),
                                     dof_coords=space.dof_coords))
        krylov_sp = make_krylov_solver(
            sys.linearSolver, sys.linearSolverIterations,
            amg_ctx=make_amg_context(np.asarray(space.dofmap), space.ndof,
                                     np.stack([free_cp_np, free_cm_np]),
                                     dof_coords=space.dof_coords))
    a_tab = [[float(v) for v in row] for row in tab.A]
    b_tab = [[float(v) for v in row] for row in tab.B]
    stages = tab.stages

    # one jitted setup program: element matrices, diagonals, and
    # lambda_max(D^-1 A) power-iteration estimates (the axon TPU backend
    # pays a compile round-trip per eager op — fuse the whole setup)
    from ..solvers.precond import estimate_dinv_spectral_radius

    @jax.jit
    def _setup(uphi_init):
        M = V.mass_jacobian_el(vt5, 1.0, False, pi)   # planar (ref behavior)
        A_phi = V.poisson_jacobian_el(vt_phi, sys.cylindrical, pi)
        d_phi = FA.constrained_diagonal(A_phi, vt_phi.dofmap, ndof, ctx_phi.free)
        o_phi = FA.make_constrained_operator(A_phi, vt_phi.dofmap, ndof, ctx_phi.free)
        probe = jnp.sin(jnp.arange(ndof) * 0.7) + 1.1
        l_phi = estimate_dinv_spectral_radius(o_phi, d_phi, probe)
        gphi0 = interp_grad(uphi_init[vt2.dofmap], vt2.gradphi)
        K0 = V.drift_diffusion_jacobian_el(gphi0, vt2, 1.0, False, pi)
        A0 = float(a_tab[0][1]) * M + (dt * float(b_tab[0][1])) * K0
        o0 = FA.make_constrained_operator(A0, vt2.dofmap, ndof, free_cp)
        d0 = FA.constrained_diagonal(A0, vt2.dofmap, ndof, free_cp)
        l_sp = estimate_dinv_spectral_radius(o0, d0, probe)
        # safety headroom: estimates are reused as the matrices drift
        # dense matrices for host-side f64 inversion (TPU XLA implements
        # LU only for f32, so the inverses are computed with numpy and
        # shipped back — a one-time setup cost)
        A_dense = M4_dense = rhs_bc = None
        if use_dense_poisson:
            A_dense = FA.dense_constrained_matrix(
                A_phi, vt_phi.dofmap, ndof, ctx_phi.free)
            # charge-coupling mass matrix: the Poisson residual is affine
            # in w = (cm - cp), r = A u + M4 w + flux; assemble M4 dense
            # with Dirichlet rows zeroed (columns stay — Dirichlet species
            # dofs contribute to the load)
            M4_el = V.mass_jacobian_el(vt_phi, 4.0 * sys.l_b * pi,
                                       sys.cylindrical, pi)
            M4_dense = jnp.zeros((ndof, ndof)).at[
                vt_phi.dofmap[:, :, None], vt_phi.dofmap[:, None, :]
            ].add(M4_el) * ctx_phi.free.astype(jnp.float64)[:, None]
            u_bc = jnp.where(ctx_phi.free, 0.0, ctx_phi.dirichlet)
            rhs_bc = ctx_phi.constrain(
                FA.spmv(A_phi, u_bc, vt_phi.dofmap, ndof)
                + ctx_phi.flux_vector)
        return M, A_phi, d_phi, l_phi * 1.2, l_sp * 1.2, A_dense, M4_dense, rhs_bc

    _uniform_stage_diag = all(
        a_tab[i][i + 1] == a_tab[0][1] and b_tab[i][i + 1] == b_tab[0][1]
        for i in range(stages))
    (M_el, A_phi_el, diag_phi, lam_phi, lam_species,
     A_phi_dense, M4_phi_dense, rhs_bc_phi) = _setup(uphi0)
    # ---- exact affine Poisson solve (constant operator) -------------------
    # The SLP re-solve (tol 1e-10, reference :349-350) on the CONSTANT
    # decoupled-Poisson operator has the closed form
    #   phi* = q + P (cm - cp),   P = -Ainv_c M4,  q = u_bc - Ainv_c r(u_bc)
    # (exact for any current phi: the linear problem's solution is unique).
    # One (N,N)@(N,) matvec per re-solve replaces residual assembly + two
    # inverse applies (measured 17 ms -> ~1 ms at the pore size). Ainv is
    # a one-time host f64 inversion (XLA TPU has no f64 LU).
    P_phi = q_phi = None
    if A_phi_dense is not None:
        Ainv_np = np.linalg.inv(np.asarray(A_phi_dense))
        u_bc_np = np.where(np.asarray(ctx_phi.free), 0.0,
                           np.asarray(ctx_phi.dirichlet))
        P_phi = jnp.asarray(-(Ainv_np @ np.asarray(M4_phi_dense)))
        q_phi = jnp.asarray(u_bc_np - Ainv_np @ np.asarray(rhs_bc_phi))
    op_phi = FA.make_constrained_operator(A_phi_el, vt_phi.dofmap, ndof, ctx_phi.free)

    free_pair = jnp.stack([free_cp, free_cm])      # (2, ndof)
    g_pair = jnp.stack([g_cp, g_cm])

    # ---- large-mesh block-RAS setup ---------------------------------------
    ctx_ras = M_phi_ras = None
    if use_block_ras:
        from ..solvers import block_ras as BR
        from ..solvers.krylov import bicgstab
        ctx_ras = BR.build_block_context_for_space(space, ras_block_size)

        @jax.jit  # one program: every eager op pays a TPU compile round-trip
        def _ras_phi_setup(A_el_):
            inv = BR.build_local_inverses(ctx_ras, A_el_, ctx_phi.free)
            # piecewise-LINEAR coarse space for the constant Poisson
            # operator (factored once; ~halves two-level iterations vs
            # the piecewise-constant space)
            p1 = BR.build_p1_coarse(ctx_ras, A_el_, vt_phi.dofmap,
                                    ctx_phi.free, space.dof_coords)
            return inv, p1

        _inv_phi, _p1_phi = _ras_phi_setup(A_phi_el)
        M_phi_ras = BR.make_two_level_precond(ctx_ras, _inv_phi, None,
                                              op_phi, ctx_phi.free,
                                              p1_coarse=_p1_phi)

    # ---- mid-size constant-Poisson f32-inverse tier -----------------------
    # (dense_poisson_threshold < ndof <= poisson_inv_threshold): the
    # Poisson operator never changes, so one device f32 inversion at setup
    # turns every 1e-10 re-solve into an f64-residual refinement loop
    # (contraction ~ kappa(A) * eps_f32 per pass) — ~5 MXU matvec rounds
    # instead of ~30 latency-bound Krylov iterations per step on TPU.
    solve_phi_inv = None
    if use_block_ras and ndof <= poisson_inv_threshold:
        from ..solvers.direct import batched_inv_f32, make_inv_refine_solver

        @jax.jit  # one program: every eager op pays a TPU compile round-trip
        def _phi_inv_setup(A_el_):
            A32 = FA.dense_constrained_matrix(
                A_el_.astype(jnp.float32), vt_phi.dofmap, ndof, ctx_phi.free)
            return batched_inv_f32(A32[None], prefer_pallas=True)

        solve_phi_inv = make_inv_refine_solver(
            _phi_inv_setup(A_phi_el), A_phi_el[None].astype(jnp.float64),
            vt_phi.dofmap, ndof, ctx_phi.free[None])

    use_dense_species = use_dense_poisson and _uniform_stage_diag

    def _build_K_pair_generic(uphi_):
        gphi = interp_grad(uphi_[vt2.dofmap], vt2.gradphi)
        K_cp = V.drift_diffusion_jacobian_el(gphi, vt2, +1.0, False, pi)
        K_cm = V.drift_diffusion_jacobian_el(gphi, vt2, -1.0, False, pi)
        return jnp.stack([K_cp, K_cm])

    # ---- fast dense stage assembly (P1): rank-1 drift as one MXU matmul --
    # For P1 both grad(phi) and the basis gradients are constant per
    # element, so the drift block is rank-1: A_drift[e,i,j] =
    # v (gphi_e . g_ei) w_ej with w_ej = sum_q f_eq shape_qj independent of
    # phi. The dense drift matrix is then D = U^T W with U[e, dof_ei] =
    # gphi_e . g_ei — ONE (N,E)x(E,N) f32 matmul per step instead of a
    # 2-D scatter of all element blocks (measured 18.4 ms -> ~3 ms at the
    # pore problem size). The constant part a M + dt b K_diff is assembled,
    # constrained, and cast once at setup. f32 assembly error lands in the
    # preconditioner only — stage solutions are refined against the exact
    # f64 element operator (solvers/direct.py).
    use_fast_dense = use_dense_species and space.degree == 1
    if use_fast_dense:
        E2 = vt2.dofmap.shape[0]
        w_el = jnp.einsum("eq,qj->ej", vt2.qw, vt2.shape)
        g_el = vt2.gradphi[:, 0]                       # (E, n, 2)
        eidx = jnp.arange(E2)[:, None]
        W32 = jnp.zeros((E2, ndof), jnp.float32).at[
            eidx, vt2.dofmap].set(w_el.astype(jnp.float32))
        K_diff_el = V.laplace_jacobian_el(vt2)         # constant stiffness
        A0_el = a_tab[0][1] * M_el + (dt * b_tab[0][1]) * K_diff_el
        A0m32 = FA.dense_constrained_matrix_batched(
            jnp.broadcast_to(A0_el, (2,) + A0_el.shape), vt2.dofmap, ndof,
            free_pair).astype(jnp.float32)
        fpair32 = free_pair.astype(jnp.float32)
        # keep every term f32 — an f64 coefficient would promote the whole
        # (2, N, N) stage matrix to f64 before the f32 inversion
        coef_pair = (dt * b_tab[0][1]) * jnp.asarray([+1.0, -1.0],
                                                     jnp.float32)
        pm_pair = jnp.asarray([+1.0, -1.0])[:, None, None, None]

    def _drift_u_el(uphi_):
        """P1 rank-1 drift row factor u_el[e,i] = grad(phi)_e . grad(N_i)_e
        (both constant per element — the drift block is u_el w_el^T)."""
        gphi_e = jnp.einsum("ei,eid->ed", uphi_[vt2.dofmap], g_el)
        return jnp.einsum("ed,eid->ei", gphi_e, g_el)

    def _build_K_pair(uphi_, u_el=None):
        """Species drift-diffusion element Jacobians for z = +-1.

        P1 fast path: K = K_diff +- u_el w_el^T exploits that the drift is
        rank-1 per element (same identity as the dense assembly below) —
        same values as the generic einsum path up to FP reassociation."""
        if not use_fast_dense:
            return _build_K_pair_generic(uphi_)
        if u_el is None:
            u_el = _drift_u_el(uphi_)
        drift = u_el[:, :, None] * w_el[:, None, :]
        return K_diff_el[None] + pm_pair * drift[None]

    def _species_dense_f32(uphi_, u_el=None):
        """Batched f32 constrained dense stage matrices at the current
        potential (the preconditioner target; exactness lives in the f64
        element blocks used by refinement)."""
        if use_fast_dense:
            if u_el is None:
                u_el = _drift_u_el(uphi_)
            U32 = jnp.zeros((E2, ndof), jnp.float32).at[
                eidx, vt2.dofmap].set(u_el.astype(jnp.float32))
            # HIGHEST: true-f32 accumulation (TPU default would assemble
            # the preconditioner matrix at bf16 accuracy)
            D = jnp.matmul(U32.T, W32,
                           precision=jax.lax.Precision.HIGHEST)  # (N, N)
            return A0m32 + coef_pair[:, None, None] * (
                fpair32[:, :, None] * fpair32[:, None, :] * D[None])
        K_pair = _build_K_pair(uphi_)
        A_stage = a_tab[0][1] * M_el[None] + (dt * b_tab[0][1]) * K_pair
        return FA.dense_constrained_matrix_batched(
            A_stage, vt2.dofmap, ndof, free_pair).astype(jnp.float32)

    def _species_factor(uphi_):
        """Batched f32 explicit inverses of the stage matrices at the
        current potential (solvers/direct.py:batched_inv_f32 — applies are
        MXU matvecs).

        The factor is reusable across steps as a refinement preconditioner
        while phi drifts (refinement checks exact f64 residuals, so
        correctness never depends on freshness — only the refinement count
        does; the driver refactorizes adaptively)."""
        from ..solvers.direct import batched_inv_f32
        return batched_inv_f32(_species_dense_f32(uphi_))

    def _species_pair_onestep(K_pair, u_old, factor=None, ras_inv=None):
        """All DIRK stages for BOTH species as one batched system (2, ndof).

        Linear stage solves at tol 1e-5 per reference :383-386. Batching
        c+/c- halves the solver-loop latency on TPU (each loop-body op has
        fixed ~0.3 ms cost regardless of the stacked size).

        Dense path: the post-bias stage systems are advection-dominated
        (Peclet >> 1) and defeat diagonal-class preconditioning — the
        reference budgets 20,000 SSOR-BiCGSTAB iterations for them
        (test/pore_pnp/pore.cfg:6). Here ONE batched f32 dense LU per step
        (both Alexander2 stages share diagonal coefficients) + f64
        iterative refinement replaces that (solvers/direct.py); the
        iterative path remains for large meshes / sharded runs.
        """

        # per-level mass/alpha scatters are cached: Alexander2 reuses
        # mass(levels[0]) in both stage residuals, and each while-loop-free
        # scatter chain costs fixed latency on TPU
        ms_cache, as_cache = {}, {}

        def mass_scatter(j, levels):
            if j not in ms_cache:
                ye = jnp.einsum("eij,sej->sei", M_el, levels[j][:, vt5.dofmap])
                ms_cache[j] = jnp.zeros((2, ndof)).at[
                    :, vt5.dofmap.ravel()].add(ye.reshape(2, -1))
            return ms_cache[j]

        def alpha_scatter(j, levels):
            if j not in as_cache:
                as_cache[j] = FA.spmv_batched(K_pair, levels[j], vt2.dofmap,
                                              ndof)
            return as_cache[j]

        solve_direct = A_stage = None
        if use_dense_species and factor is not None:
            from ..solvers.direct import make_inv_refine_solver
            A_stage = a_tab[0][1] * M_el[None] + (dt * b_tab[0][1]) * K_pair
            solve_direct = make_inv_refine_solver(
                factor, A_stage, vt2.dofmap, ndof, free_pair)

        levels = [u_old]
        iters = jnp.int32(0)
        for i in range(stages):
            a_ii, b_ii = a_tab[i][i + 1], b_tab[i][i + 1]
            hist = jnp.zeros((2, ndof))
            for j in range(i + 1):
                if a_tab[i][j] != 0.0:
                    hist = hist + a_tab[i][j] * mass_scatter(j, levels)
                if b_tab[i][j] != 0.0:
                    hist = hist + dt * b_tab[i][j] * alpha_scatter(j, levels)
            guess = jnp.where(free_pair, levels[-1], g_pair)
            if A_stage is not None:
                # guess's mass + alpha terms share the stage blocks (uniform
                # diagonal) and the dofmap: ONE gather/einsum/scatter pass
                r = hist + FA.spmv_batched(A_stage, guess, vt2.dofmap, ndof)
            else:
                ye = jnp.einsum("eij,sej->sei", M_el, guess[:, vt5.dofmap])
                mg = jnp.zeros((2, ndof)).at[:, vt5.dofmap.ravel()].add(
                    ye.reshape(2, -1))
                r = hist + a_ii * mg + dt * b_ii * FA.spmv_batched(
                    K_pair, guess, vt2.dofmap, ndof)
            r = jnp.where(free_pair, r, 0.0)
            if solve_direct is not None:
                z, k = solve_direct(r, stage_reduction)
                levels.append(guess - z)
                iters = iters + k
                continue
            A_el = a_ii * M_el[None] + (dt * b_ii) * K_pair
            if use_block_ras and mixed_precision:
                op = FA.make_constrained_operator_mixed(A_el, vt2.dofmap,
                                                        ndof, free_pair)
            else:
                op = FA.make_constrained_operator_batched(A_el, vt2.dofmap,
                                                          ndof, free_pair)
            if use_block_ras:
                from ..solvers import block_ras as BR
                from ..solvers.krylov import bicgstab
                inv_s = ras_inv
                if inv_s is None:  # non-uniform tableau diagonal
                    inv_s = BR.build_local_inverses(ctx_ras, A_el, free_pair)
                M_s = BR.make_ras_precond(ctx_ras, inv_s, free_pair)
                res = bicgstab(op, r, jnp.zeros_like(r), M_s,
                               stage_reduction, sys.linearSolverIterations)
                levels.append(guess - res.x)
                iters = iters + res.iterations
                continue
            dg = jnp.einsum("seii->sei", A_el)
            dg = jnp.zeros((2, ndof)).at[:, vt2.dofmap.ravel()].add(
                dg.reshape(2, -1))
            dg = jnp.where(free_pair, dg, 1.0)
            res = krylov_sp(op, r, jnp.zeros_like(r), dg, stage_reduction,
                            lam=lam_species, A_el=A_el)
            levels.append(guess - res.x)
            iters = iters + res.iterations
        return levels[-1], iters

    def _species_step(uphi_, ucp_, ucm_):
        """Fresh factorization + step (simple path; see also the reuse
        pair species_factor/species_step_reuse for amortized LU)."""
        u_el = _drift_u_el(uphi_) if use_fast_dense else None
        K_pair = _build_K_pair(uphi_, u_el)
        factor = ras_inv = None
        if use_dense_species:
            from ..solvers.direct import batched_inv_f32
            factor = batched_inv_f32(_species_dense_f32(uphi_, u_el))
        elif use_block_ras and _uniform_stage_diag:
            # one batched local factorization serves every DIRK stage
            from ..solvers import block_ras as BR
            A_stage = a_tab[0][1] * M_el[None] + (dt * b_tab[0][1]) * K_pair
            ras_inv = BR.build_local_inverses(ctx_ras, A_stage, free_pair)
        out, iters = _species_pair_onestep(K_pair, jnp.stack([ucp_, ucm_]),
                                           factor, ras_inv)
        return out[0], out[1], iters

    def _species_step_reuse(factor, uphi_, ucp_, ucm_):
        """Step with a possibly-stale inverse preconditioner (refinement
        counts rise as phi drifts; correctness is residual-checked)."""
        K_pair = _build_K_pair(uphi_)
        out, iters = _species_pair_onestep(K_pair, jnp.stack([ucp_, ucm_]),
                                           factor)
        return out[0], out[1], iters

    # ---- large-mesh factor amortization: RAS local inverses are the
    # dominant per-step setup cost; a stale factor only raises BiCGSTAB
    # iteration counts (correctness is the 1e-5 residual), so the driver
    # may refresh on a cadence (ras_refresh_every)
    def _species_factor_ras(uphi_):
        from ..solvers import block_ras as BR
        K_pair = _build_K_pair(uphi_)
        A_stage = a_tab[0][1] * M_el[None] + (dt * b_tab[0][1]) * K_pair
        return BR.build_local_inverses(ctx_ras, A_stage, free_pair)

    def _species_step_reuse_ras(ras_inv, uphi_, ucp_, ucm_):
        K_pair = _build_K_pair(uphi_)
        out, iters = _species_pair_onestep(K_pair, jnp.stack([ucp_, ucm_]),
                                           None, ras_inv)
        return out[0], out[1], iters

    use_ras_factor = use_block_ras and _uniform_stage_diag

    def _poisson_residual(uphi_, ucp_, ucm_):
        ue = uphi_[vt_phi.dofmap]
        r_el = V.poisson_residual_el(ue, ucp_[vt_phi.dofmap], ucm_[vt_phi.dofmap],
                                     vt_phi, sys.l_b, sys.cylindrical, pi)
        r = FA.scatter_add(r_el, vt_phi.dofmap, ndof) + ctx_phi.flux_vector
        return ctx_phi.constrain(r)

    def _poisson_solve(uphi_, ucp_, ucm_):
        """SLP apply at tolerance 1e-10 (reference :349-350).

        Dense path: the exact affine form phi* = q + P (cm - cp) — one
        matvec, no residual assembly, no solver loop (see setup above).
        Large-mesh path: BiCGSTAB + two-level block-RAS (constant
        operator — local/coarse factors from setup)."""
        if P_phi is not None:
            return q_phi + P_phi @ (ucm_ - ucp_), jnp.int32(1)
        r = _poisson_residual(uphi_, ucp_, ucm_)
        if solve_phi_inv is not None:
            x, k = solve_phi_inv(r[None], 1e-10)
            return uphi_ - x[0], k
        if M_phi_ras is not None:
            from ..solvers.krylov import bicgstab
            if mixed_precision:
                # two f32-operator passes at 1e-5 with an exact f64
                # residual between them reach the 1e-10 target (classic
                # mixed-precision iterative refinement)
                op_mx = FA.make_constrained_operator_mixed(
                    A_phi_el, vt_phi.dofmap, ndof, ctx_phi.free)
                r1 = bicgstab(op_mx, r, jnp.zeros_like(r), M_phi_ras, 1e-5,
                              sys.linearSolverIterations)
                r_exact = ctx_phi.constrain(r - op_phi(r1.x))
                r2 = bicgstab(op_mx, r_exact, jnp.zeros_like(r), M_phi_ras,
                              1e-5, sys.linearSolverIterations)
                return (uphi_ - (r1.x + r2.x),
                        r1.iterations + r2.iterations)
            res = bicgstab(op_phi, r, jnp.zeros_like(r), M_phi_ras, 1e-10,
                           sys.linearSolverIterations)
            return uphi_ - res.x, res.iterations
        res = krylov_phi(op_phi, r, jnp.zeros_like(r), diag_phi, 1e-10,
                         lam=lam_phi, A_el=A_phi_el)
        return uphi_ - res.x, res.iterations

    def _fused_step(uphi_, ucp_, ucm_):
        ucp_, ucm_, _ = _species_step(uphi_, ucp_, ucm_)
        uphi_, _ = _poisson_solve(uphi_, ucp_, ucm_)
        return uphi_, ucp_, ucm_

    @functools.partial(jax.jit, static_argnums=1)
    def scan_steps(state, n_steps: int):
        """n_steps fused steps as one lax.scan (potentialUpdateFreq == 1)."""

        def body(carry, _):
            return _fused_step(*carry), None

        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    _step_reuse = (_species_step_reuse if use_dense_species else
                   _species_step_reuse_ras if use_ras_factor else None)

    def _fused_step_reuse(factor, uphi_, ucp_, ucm_):
        ucp2, ucm2, _ = _step_reuse(factor, uphi_, ucp_, ucm_)
        uphi2, _ = _poisson_solve(uphi_, ucp2, ucm2)
        return uphi2, ucp2, ucm2

    return PnpSystem(
        sys=sys, space=space, pb=pb, pb_newton_iterations=pb_iters,
        uphi0=uphi0, ucp0=ucp0, ucm0=ucm0,
        species_step=jax.jit(_species_step),
        poisson_solve=jax.jit(_poisson_solve),
        fused_step=jax.jit(_fused_step),
        scan_steps=scan_steps,
        ionflux_tables=build_ionflux_tables(space, sys.cylindrical, pi,
                                            sys.n_surfaces),
        dt=dt,
        species_factor=(jax.jit(_species_factor) if use_dense_species else
                        jax.jit(_species_factor_ras) if use_ras_factor
                        else None),
        species_step_reuse=(jax.jit(_step_reuse) if _step_reuse else None),
        factor_kind=("dense" if use_dense_species else
                     "ras" if use_ras_factor else None),
        fused_step_reuse=(jax.jit(_fused_step_reuse) if _step_reuse
                          else None))


@dataclasses.dataclass
class PnpRunResult:
    phi: Any
    cp: Any
    cm: Any
    time: float
    steps: int
    pb_newton_iterations: int
    current_history: list      # [(time, ip(n_surf,), im(n_surf,)), ...]
    space: FunctionSpace


def run_instationary_pnp_from_pb(
    sys: Sysparams,
    space: FunctionSpace,
    n_steps: Optional[int] = None,
    output_dir: Optional[str] = None,
    tableau: Optional[Tableau] = None,
    device_mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_freq: int = 0,
    resume: bool = False,
    flux_convention: str = "reference",
    presolve_potential: bool = False,
    stage_reduction: float = 1e-5,
    dense_poisson_threshold: int = 8192,
    ras_block_size: int = 256,
    ras_refresh_every: int = 1,
    mixed_precision: bool = False,
    poisson_inv_threshold: int = 16384,
) -> PnpRunResult:
    """Run phases A-D. ``presolve_potential`` is a deviation switch: the
    reference's first species step sees the raw Dirichlet bias jump
    (slp.apply() only runs after it, src :421-429); solving Poisson once
    before the loop replaces that discontinuity with the smooth potential
    of the initial concentrations and tames the violent early transient."""
    n_steps = sys.nSteps if n_steps is None else n_steps
    system = build_pnp_system(sys, space, tableau, device_mesh,
                              stage_reduction=stage_reduction,
                              dense_poisson_threshold=dense_poisson_threshold,
                              ras_block_size=ras_block_size,
                              mixed_precision=mixed_precision,
                              poisson_inv_threshold=poisson_inv_threshold)
    uphi, ucp, ucm = system.uphi0, system.ucp0, system.ucm0
    dt = system.dt
    if presolve_potential:
        uphi, _ = system.poisson_solve(uphi, ucp, ucm)

    # ---- Phase D: time loop ---------------------------------------------
    time = 0.0
    start_step = 0
    if resume and checkpoint_path:
        ck = load_checkpoint(checkpoint_path, sys)
        if ck is not None:
            uphi = jnp.asarray(ck["phi"])
            ucp = jnp.asarray(ck["cp"])
            ucm = jnp.asarray(ck["cm"])
            time, start_step = ck["time"], ck["step"]

    current_writer = None
    output_counter = 0
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        current_writer = CurrentWriter(os.path.join(output_dir, "current.dat"))
        write_dat(space, uphi, os.path.join(output_dir, "phi.dat"))
        write_dat(space, ucp, os.path.join(output_dir, "cp.dat"))
        write_dat(space, ucm, os.path.join(output_dir, "cm.dat"))

    history = []
    # fresh stage factorization each step: measured faster on TPU than
    # LU-reuse-with-refinement (the production transient moves phi every
    # step, making a stale LU a refactor+redo with extra host syncs);
    # species_factor/species_step_reuse remain available for slowly-varying
    # regimes
    use_ras_reuse = (ras_refresh_every > 1 and system.factor_kind == "ras")
    ras_factor = None
    for i in range(start_step, n_steps):
        if use_ras_reuse:
            # large-mesh factor amortization: refresh the RAS local
            # inverses every ras_refresh_every steps; stale factors only
            # raise BiCGSTAB counts (stage solves remain 1e-5-exact)
            if ras_factor is None or (i - start_step) % ras_refresh_every == 0:
                ras_factor = system.species_factor(uphi)
            if i % sys.potentialUpdateFreq == 0:
                # one program for species stages + Poisson re-solve
                uphi, ucp, ucm = system.fused_step_reuse(ras_factor, uphi,
                                                         ucp, ucm)
            else:
                ucp, ucm, _ = system.species_step_reuse(ras_factor, uphi,
                                                        ucp, ucm)
        elif i % sys.potentialUpdateFreq == 0:
            # one program for species stages + Poisson re-solve (saves a
            # dispatch + host sync vs separate calls)
            uphi, ucp, ucm = system.fused_step(uphi, ucp, ucm)
        else:
            ucp, ucm, _ = system.species_step(uphi, ucp, ucm)
        time += dt
        if i % sys.outputFreq == 0:
            output_counter += 1
            ip, im = calc_ion_flux(system.ionflux_tables, uphi, ucp, ucm,
                                   convention=flux_convention)
            history.append((time, np.asarray(ip), np.asarray(im)))
            if output_dir:
                for name, vec in (("phi", uphi), ("cp", ucp), ("cm", ucm)):
                    write_dat(space, vec, os.path.join(
                        output_dir, f"{name}{output_counter:03d}.dat"))
                write_vtu(space, {"phi": np.asarray(uphi),
                                  "cp": np.asarray(ucp),
                                  "cm": np.asarray(ucm)},
                          os.path.join(output_dir, f"data{output_counter:03d}.vtu"))
                current_writer.write(time, ip, im)
        if checkpoint_path and checkpoint_freq and (i + 1) % checkpoint_freq == 0:
            save_checkpoint(checkpoint_path, sys, i + 1, time, uphi, ucp, ucm)
        # failure guard (the reference swallows failures and loses the run,
        # SURVEY.md section 5): detect non-finite state, dump an emergency
        # checkpoint, and abort with a diagnosable error
        if (i + 1) % 16 == 0 or i + 1 == n_steps:
            if not bool(jnp.isfinite(uphi).all() & jnp.isfinite(ucp).all()
                        & jnp.isfinite(ucm).all()):
                if checkpoint_path:
                    save_checkpoint(checkpoint_path + ".emergency", sys,
                                    i + 1, time, uphi, ucp, ucm)
                raise FloatingPointError(
                    f"non-finite state at step {i + 1} (t={time:g}); "
                    "reduce tau or enable presolve_potential")

    uphi, _ = system.poisson_solve(uphi, ucp, ucm)  # final solve (ref :454)
    if current_writer:
        current_writer.close()
    return PnpRunResult(
        phi=uphi, cp=ucp, cm=ucm, time=time, steps=n_steps,
        pb_newton_iterations=system.pb_newton_iterations,
        current_history=history, space=space)

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
    # dense path only: jitted (uphi) -> (2, ndof, ndof) f32 constrained
    # stage matrices (tooling hook: tools/tpu_flagship_inverse_study.py)
    species_dense_f32: Any = None


def build_pnp_system(
    sys: Sysparams,
    space: FunctionSpace,
    tableau: Optional[Tableau] = None,
    device_mesh=None,
    pb_field=None,
    dense_poisson_threshold: int = 8192,
    stage_reduction: float = 1e-5,
    ras_block_size: int = 256,
    mixed_precision: Optional[bool] = None,
    poisson_inv_threshold: int = 49152,
    species_inv_threshold: int = 0,
    species_two_level: Optional[bool] = None,
    stage_residual_f32: Optional[bool] = None,
    krylov_f32_inner: Optional[bool] = None,
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

    ``species_inv_threshold``: mid-size SPECIES tier inside the block-RAS
    path (TPU only; DEFAULT 0 = off). Up to this size the batched
    (2, ndof, ndof) f32 stage inverses replace the 10-12 BiCGSTAB
    iterations per stage solve with a handful of refinement matvecs,
    rebuilt per refresh by a host-dispatched Pallas-GJ +
    contraction-probe program with an automatic RAS-factor fallback per
    refresh window (the r2 non-finite corner cannot recur as a silent
    default). Measured on the v5e at 11,839 nodes: fused step 369 -> 143
    ms at a fresh factor, but the 727 ms GJ factor build per refresh
    makes the EFFECTIVE step a wash vs one-level RAS (~390 ms both), and
    the mixed-precision RAS default beats both — kept opt-in for
    slowly-varying regimes where the refresh cadence can stretch.
    """
    tab = tableau if tableau is not None else alexander2()
    dt = sys.tau
    pi = sys.pi
    use_dense_poisson = (space.ndof <= dense_poisson_threshold
                         and device_mesh is None)
    use_block_ras = (device_mesh is None and not use_dense_poisson
                     and sys.linearSolver == "BCGS_SSORk")
    if mixed_precision is None:
        # TPU default (r3 A/B at 46,653 nodes, same iteration counts):
        # f32 operator applies cut the f64-EMULATED SpMV cost — species
        # stage solves 2017 -> 859 ms, Poisson-RAS 4706 -> 3141 ms.
        # CPU keeps native f64 (mixed only adds casts there); accuracy is
        # covered by the two-pass f64-residual refinement and validated
        # in tests/test_block_ras.py.
        mixed_precision = (use_block_ras
                           and jax.default_backend() == "tpu")
    if species_two_level is None:
        # OPT-IN (r4 verdict: mixed evidence). The r3 device fault was
        # root-caused to the monolithic batched p1-coarse assembly and
        # fixed by element-chunked partial sums; the 16-step hardware
        # e2e at 46,653 nodes runs finite with species its 22 -> 14
        # (tools/results_tpu_two_level_e2e_r4.log) — but the bench-state
        # A/B shows the iteration cut does not pay for the two extra
        # operator applies per preconditioner application (species
        # 898 ms/17 its two-level vs 766 ms/22 its one-level), so
        # one-level RAS stays the species default at every size.
        species_two_level = os.environ.get("PNP_TPU_SPECIES_2L") == "1"
    species_two_level = species_two_level and use_block_ras
    if stage_residual_f32 is None:
        # stage refinement residuals via the true-f32 element operator:
        # DECLINED by the r4 hardware A/B
        # (tools/results_tpu_res32_ab_r4.log) — no step-time win (50.5
        # -> 49.8 ms), refinement counts 4 -> 42, and the trajectory
        # left the stage-slack budget by 4 decades: the advective stage
        # refinement NEEDS f64-exact residuals. Kept as an explicit
        # opt-in for diffusion-dominated regimes only.
        stage_residual_f32 = os.environ.get("PNP_TPU_STAGE_RES32") == "1"
    stage_residual_f32 = stage_residual_f32 and jax.default_backend() == "tpu"
    if krylov_f32_inner is None:
        # f32 KRYLOV VECTORS on the block-RAS paths (TPU DEFAULT, r4):
        # r3 made the operator APPLIES f32 but left the BiCGSTAB
        # recurrences/dots/axpys on f64-EMULATED vectors — the L3 profile
        # measured the f64 op apply at 164 ms vs 21 ms f32 and two-level
        # per-iteration 159.8 -> 80.7 ms (results_tpu_l3_profile_r4.log).
        # The 1e-10 Poisson target is reached by f64-exact outer
        # residuals between f32 passes (residual-checked pass loop);
        # stage solves are 1e-5 where f32 norms are ~1e-7-accurate.
        # Hardware e2e: tools/results_tpu_scaled_e2e_r4.log (L1 fused
        # 166 ms, L2 981 ms, iteration counts unchanged vs r3, 6 finite
        # steps each). PNP_TPU_KRYLOV32=0 disables.
        krylov_f32_inner = os.environ.get("PNP_TPU_KRYLOV32") != "0"
    # f32 vectors only ever pair with the true-f32 (mixed) operator — an
    # f64 operator would silently promote each SpMV and downcast on the
    # scatter (observed as a FutureWarning in the r4 baseline A/B)
    krylov_f32_inner = (krylov_f32_inner and use_block_ras
                        and mixed_precision
                        and jax.default_backend() == "tpu")

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

    # huge meshes (level 4+, >= 600k elements): every program capturing
    # the element tables must HOIST them to runtime arguments — the
    # remote compiler ships closure constants in the compile request and
    # this _setup alone captures ~1.2 GB of order-2/3/5 tables at the
    # 1.47M-element level-4 pore (HTTP 413, utils/hoist.py)
    from ..utils.hoist import hoist_needed, select_jit
    _jit = select_jit(vt2.num_elements)
    # level-4 meshes also run RAS factor ASSEMBLY and INVERSION as two
    # separate programs (fused RESOURCE_EXHAUSTEDs: both halves' peaks
    # live at once in XLA's buffer assignment, tools/l4_factor_bisect.log)
    _split_factor = hoist_needed(vt2.num_elements)

    @_jit
    def _setup(uphi_init):
        M = V.mass_jacobian_el(vt5, 1.0, False, pi)   # planar (ref behavior)
        A_phi = V.poisson_jacobian_el(vt_phi, sys.cylindrical, pi)
        d_phi = FA.constrained_diagonal(A_phi, vt_phi.dofmap, ndof, ctx_phi.free)
        o_phi = FA.make_constrained_operator(A_phi, vt_phi.dofmap, ndof, ctx_phi.free)
        probe = jnp.sin(jnp.arange(ndof) * 0.7) + 1.1
        l_phi = estimate_dinv_spectral_radius(o_phi, d_phi, probe)
        from ..operators.common import map_table_chunks

        def _k0_body(tc, ue_c):
            gphi0 = interp_grad(ue_c, tc.gradphi)
            return V.drift_diffusion_jacobian_el(gphi0, tc, 1.0, False, pi)

        K0 = map_table_chunks(_k0_body, vt2, (uphi_init[vt2.dofmap],))
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
    dense_phi_pre = None
    if A_phi_dense is not None:
        Ainv_np = np.linalg.inv(np.asarray(A_phi_dense))
        u_bc_np = np.where(np.asarray(ctx_phi.free), 0.0,
                           np.asarray(ctx_phi.dirichlet))
        dense_phi_pre = (jnp.asarray(-(Ainv_np @ np.asarray(M4_phi_dense))),
                         jnp.asarray(u_bc_np - Ainv_np @ np.asarray(rhs_bc_phi)))
    op_phi = FA.make_constrained_operator(A_phi_el, vt_phi.dofmap, ndof, ctx_phi.free)

    free_pair = jnp.stack([free_cp, free_cm])      # (2, ndof)
    g_pair = jnp.stack([g_cp, g_cm])

    # ---- large-mesh block-RAS setup ---------------------------------------
    ctx_ras = ras_phi_pre = None
    if use_block_ras:
        from ..solvers import block_ras as BR
        ctx_ras = BR.build_block_context_for_space(space, ras_block_size)

    # ---- mid-size constant-Poisson f32-inverse tier -----------------------
    # (dense_poisson_threshold < ndof <= poisson_inv_threshold): the
    # Poisson operator never changes, so one device f32 inversion at setup
    # turns every 1e-10 re-solve into an f64-residual refinement loop
    # (contraction ~ kappa(A) * eps_f32 per pass) — ~5 MXU matvec rounds
    # instead of ~30 latency-bound Krylov iterations per step on TPU.
    solve_phi_inv = phi_inv = None
    if use_block_ras and ndof <= poisson_inv_threshold:
        # inverse setup is HOST-dispatched (solvers/direct.py): the r2
        # lax.cond form compiled an ndof^2 XLA-LU fallback into the setup
        # program and broke the tier with a vmem OOM at 11,839 dofs
        # (VERDICT r2 item 1) — the Pallas inverse + probe now runs as its
        # own program and failures fall back host-side. The inverse is
        # threaded through every consumer as a RUNTIME ARGUMENT (never a
        # jit closure constant): the remote-compile service ships closure
        # constants in the compile request and a 560 MB inverse trips its
        # body-size limit (HTTP 413).
        from ..solvers.direct import (inv_f32_setup, inv_f32_setup_large,
                                      make_inv_refine_solver_arg)
        if ndof <= 16384:
            @jax.jit  # one program: eager ops pay TPU compile round-trips
            def _phi_dense32(A_el_):
                return FA.dense_constrained_matrix(
                    A_el_.astype(jnp.float32), vt_phi.dofmap, ndof,
                    ctx_phi.free)

            phi_inv = inv_f32_setup(_phi_dense32(A_phi_el)[None])
        elif jax.default_backend() == "tpu":  # Pallas-only tier
            # VERY-LARGE tier (to ~48k dofs; r3): the (ndof, ndof) f32
            # inverse is ~8.7 GB at 46,653 dofs — only ONE such buffer
            # fits next to the run state. XLA TPU COPIES donated scatter
            # operands (measured: "Output shares 0B with arguments",
            # 2 x 8.12 GB OOM), so the equilibrated matrix A_eq = S A S
            # is assembled in ROW CHUNKS via donated dynamic_update_slice
            # (which does alias reliably), at the 128-padded size Np so
            # the Pallas GJ never re-pads the buffer (identity rows on
            # the pad). The inverse stays padded+scaled; every apply
            # pads/crops the small vectors (solvers/direct.py:
            # scaled_inv_apply). Payoff: the 1e-10 Poisson re-solve drops
            # from ~32 BiCGSTAB iterations (~6.0 s/step at 46k, the
            # dominant cost of the r2 large-mesh step) to a handful of
            # refinement matvecs.
            f32 = jnp.float32
            Np = ((ndof + 127) // 128) * 128
            n_chunks = 8
            while Np % n_chunks or (Np // n_chunks) % 8:
                n_chunks -= 1          # exact partition, sublane-aligned
            rows_c = Np // n_chunks

            @jax.jit
            def _phi_parts(A_el_):
                d = FA.constrained_diagonal(A_el_, vt_phi.dofmap, ndof,
                                            ctx_phi.free)
                sc = jax.lax.rsqrt(jnp.maximum(jnp.abs(d), 1e-30)).astype(f32)
                free32 = ctx_phi.free.astype(f32)
                w_el = (free32 * sc)[vt_phi.dofmap]          # (E, n)
                Am = (A_el_.astype(f32) * w_el[:, :, None]
                      * w_el[:, None, :])
                # diag bump: Dirichlet identity rows (sc = 1 there) and
                # identity on the [ndof, Np) pad rows
                bump = jnp.ones(Np, f32).at[:ndof].set(1.0 - free32)
                s_pad = jnp.ones(Np, f32).at[:ndof].set(sc)
                return Am, s_pad, bump

            @functools.partial(jax.jit, donate_argnums=0)
            def _phi_chunk(A_, Am_, bump_, r0):
                # rows outside the chunk map to the (positive) OOB slot:
                # a plain ``dofmap - r0`` would give NEGATIVE indices for
                # earlier rows, which jax WRAPS python-style before the
                # mode="drop" check — the bug that scattered every
                # element one chunk below its true row
                ir = jnp.where((vt_phi.dofmap >= r0)
                               & (vt_phi.dofmap < r0 + rows_c),
                               vt_phi.dofmap - r0, rows_c)
                Ch = jnp.zeros((rows_c, Np), f32).at[
                    ir[:, :, None], vt_phi.dofmap[:, None, :]].add(
                        Am_, mode="drop")
                ix = jnp.arange(rows_c)
                db = jax.lax.dynamic_slice(bump_, (r0,), (rows_c,))
                Ch = Ch.at[ix, r0 + ix].add(db, mode="drop")
                z0 = jnp.int32(0)
                old = jax.lax.dynamic_slice(A_, (z0, r0, z0),
                                            (1, rows_c, Np))
                return jax.lax.dynamic_update_slice(
                    A_, old + Ch[None], (z0, r0, z0))

            Am_phi, s_phi, bump_phi = _phi_parts(A_phi_el)
            A_eq = jax.jit(lambda: jnp.zeros((1, Np, Np), f32))()
            for c in range(n_chunks):
                A_eq = _phi_chunk(A_eq, Am_phi, bump_phi,
                                  jnp.int32(c * rows_c))
            op_pb = FA.make_constrained_operator_batched(
                A_phi_el[None].astype(jnp.float64), vt_phi.dofmap, ndof,
                ctx_phi.free[None])
            X_eq, ok = inv_f32_setup_large(A_eq, s_phi, op_pb, ndof)
            del A_eq
            if ok:
                phi_inv = (X_eq, s_phi)
        if phi_inv is not None:
            solve_phi_inv = make_inv_refine_solver_arg(
                A_phi_el[None].astype(jnp.float64),
                vt_phi.dofmap, ndof, ctx_phi.free[None])

    if use_block_ras and phi_inv is None:
        # two-level RAS Poisson factors, built ONLY when the inverse tier
        # did not engage (above threshold or probe failure): on a 16 GB
        # chip the ~150 MB factors plus an 8.7 GB inverse would waste the
        # headroom the very-large tier needs. Factors stay a runtime
        # pytree (passed as arguments to every consumer program): at
        # level-3 scale the (K, L, L) local inverses are ~0.5 GB, and
        # closure constants of that size trip the remote compiler's
        # request-body limit (HTTP 413).
        from ..solvers import block_ras as BR

        # coarse richness: 3 linear modes/block by default; 6 adds the
        # quadratic modes (PNP_TPU_P1_COARSE_MODES=6) — the r4-roadmap
        # candidate for the L3 Poisson's 48-iteration solves
        _coarse_modes = int(os.environ.get("PNP_TPU_P1_COARSE_MODES", "3"))

        if _split_factor:
            # level-4: assembly and inversion as SEPARATE programs (the
            # fused factor program RESOURCE_EXHAUSTEDs while each half
            # fits, tools/l4_factor_bisect.log)
            @_jit
            def _ras_phi_assemble(A_el_):
                A_loc = BR.assemble_local_matrices(ctx_ras, A_el_,
                                                   ctx_phi.free)
                p1 = BR.build_p1_coarse(ctx_ras, A_el_, vt_phi.dofmap,
                                        ctx_phi.free, space.dof_coords,
                                        n_modes=_coarse_modes)
                return A_loc, p1

            _A_loc_phi, _p1_phi = _ras_phi_assemble(A_phi_el)
            # host-orchestrated chunked in-place inversion (whole-batch
            # and in-jit-chunked programs both RESOURCE_EXHAUST at L4)
            ras_phi_pre = (BR.invert_local_matrices_outofcore(_A_loc_phi),
                           _p1_phi)
            del _A_loc_phi
        else:
            @_jit  # one program: eager ops pay TPU compile round-trips
            def _ras_phi_setup(A_el_):
                inv = BR.build_local_inverses(ctx_ras, A_el_, ctx_phi.free)
                # piecewise-LINEAR coarse space for the constant Poisson
                # operator (factored once; ~halves two-level iterations
                # vs the piecewise-constant space)
                p1 = BR.build_p1_coarse(ctx_ras, A_el_, vt_phi.dofmap,
                                        ctx_phi.free, space.dof_coords,
                                        n_modes=_coarse_modes)
                return inv, p1

            ras_phi_pre = _ras_phi_setup(A_phi_el)

    use_dense_species = use_dense_poisson and _uniform_stage_diag

    def _build_K_pair_generic(uphi_):
        # interp_grad + both jacobians run INSIDE one element-chunked map:
        # at level-3 scale an unchunked interp_grad materializes its own
        # lane-padded gradphi temp (the 42x copies of the r3 compile OOM)
        from ..operators.common import map_table_chunks

        def body(tc, ue_c):
            gphi = interp_grad(ue_c, tc.gradphi)
            return (V.drift_diffusion_jacobian_el(gphi, tc, +1.0, False, pi),
                    V.drift_diffusion_jacobian_el(gphi, tc, -1.0, False, pi))

        K_cp, K_cm = map_table_chunks(body, vt2, (uphi_[vt2.dofmap],))
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

    def _species_pair_onestep(K_pair, u_old, factor=None, ras_inv=None,
                              huge_mesh=False):
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

        # huge meshes (level 4, 1.47M elements): every whole-E
        # gather/einsum/scatter OUTSIDE the Krylov loop gets remat-
        # compressed by XLA into 42.7x lane-padded copies (an 11.2 GB
        # (8, E, 2, 3) temp — compile OOM at 34 GB on a 15.75 GB chip,
        # tools/l4_probe_r5p.log); the rhs builds go through
        # map_element_chunk_sum and the element products stay f32 (the
        # mixed operator casts to f32 anyway; stage tolerance 1e-5)
        from ..operators.common import map_element_chunk_sum
        M_rhs = M_el.astype(jnp.float32) if huge_mesh else M_el

        def _mass_apply(u):
            if huge_mesh:
                def body(M_c, dm_c):
                    ye = jnp.einsum("eij,sej->sei", M_c, u[:, dm_c])
                    return jnp.zeros((2, ndof)).at[
                        :, dm_c.ravel()].add(ye.reshape(2, -1),
                                             mode="drop")
                return map_element_chunk_sum(body, (M_rhs, vt5.dofmap))
            ye = jnp.einsum("eij,sej->sei", M_el, u[:, vt5.dofmap])
            return jnp.zeros((2, ndof)).at[
                :, vt5.dofmap.ravel()].add(ye.reshape(2, -1))

        def _alpha_apply(u):
            if huge_mesh:
                K_sw = K_pair.swapaxes(0, 1)         # (E, 2, 3, 3)

                def body(K_c, dm_c):
                    ye = jnp.einsum("esij,sej->sei", K_c, u[:, dm_c])
                    return jnp.zeros((2, ndof)).at[
                        :, dm_c.ravel()].add(ye.reshape(2, -1),
                                             mode="drop")
                return map_element_chunk_sum(body, (K_sw, vt2.dofmap))
            return FA.spmv_batched(K_pair, u, vt2.dofmap, ndof)

        def mass_scatter(j, levels):
            if j not in ms_cache:
                ms_cache[j] = _mass_apply(levels[j])
            return ms_cache[j]

        def alpha_scatter(j, levels):
            if j not in as_cache:
                as_cache[j] = _alpha_apply(levels[j])
            return as_cache[j]

        solve_direct = A_stage = None
        if factor is not None:  # dense flagship OR mid-size tier inverse
            from ..solvers.direct import make_inv_refine_solver
            A_stage = a_tab[0][1] * M_el[None] + (dt * b_tab[0][1]) * K_pair
            solve_direct = make_inv_refine_solver(
                factor, A_stage, vt2.dofmap, ndof, free_pair,
                residual_mixed=stage_residual_f32)

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
                r = (hist + a_ii * _mass_apply(guess)
                     + dt * b_ii * _alpha_apply(guess))
            r = jnp.where(free_pair, r, 0.0)
            if solve_direct is not None:
                z, k = solve_direct(r, stage_reduction)
                levels.append(guess - z)
                iters = iters + k
                continue
            # huge meshes: the f32 product keeps the whole-E stage blocks
            # out of the f64-emulation remat path (the mixed operator
            # casts to f32 anyway)
            A_el = a_ii * (M_rhs[None] if huge_mesh else M_el[None]) \
                + (dt * b_ii) * K_pair
            if use_block_ras and mixed_precision:
                op = FA.make_constrained_operator_mixed(A_el, vt2.dofmap,
                                                        ndof, free_pair)
            else:
                op = FA.make_constrained_operator_batched(A_el, vt2.dofmap,
                                                          ndof, free_pair)
            if use_block_ras:
                from ..solvers import block_ras as BR
                from ..solvers.krylov import bicgstab
                inv_s, p1_s = ras_inv, None
                if isinstance(ras_inv, tuple):
                    inv_s, p1_s = ras_inv
                if inv_s is None:  # non-uniform tableau diagonal
                    inv_s = BR.build_local_inverses(ctx_ras, A_el, free_pair)
                if p1_s is not None:
                    # two-level: p1 coarse correction tames the 1/H
                    # iteration growth of one-level RAS on the large
                    # advective stage systems (built per factor refresh)
                    M_s = BR.make_two_level_precond(ctx_ras, inv_s, None,
                                                    op, free_pair,
                                                    p1_coarse=p1_s)
                else:
                    M_s = BR.make_ras_precond(ctx_ras, inv_s, free_pair)
                # f32 Krylov vectors (krylov_f32_inner): the stage target
                # is 1e-5 relative where f32 norms carry ~1e-7 accuracy;
                # every f64 vector op in the loop body is EMULATED on TPU
                rs = r.astype(jnp.float32) if krylov_f32_inner else r
                res = bicgstab(op, rs, jnp.zeros_like(rs), M_s,
                               stage_reduction, sys.linearSolverIterations)
                levels.append(guess - res.x.astype(r.dtype))
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
            if species_two_level:
                ras_inv = (ras_inv, BR.build_p1_coarse_batched(
                    ctx_ras, A_stage, vt2.dofmap, free_pair,
                    space.dof_coords))
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
        inv = BR.build_local_inverses(ctx_ras, A_stage, free_pair)
        if species_two_level:
            return (inv, BR.build_p1_coarse_batched(
                ctx_ras, A_stage, vt2.dofmap, free_pair, space.dof_coords))
        return inv

    def _species_step_reuse_ras(ras_inv, uphi_, ucp_, ucm_):
        K_pair = _build_K_pair(uphi_)
        out, iters = _species_pair_onestep(K_pair, jnp.stack([ucp_, ucm_]),
                                           None, ras_inv)
        return out[0], out[1], iters

    use_ras_factor = use_block_ras and _uniform_stage_diag
    # mid-size species tier (r3): for block-RAS meshes up to ~12k dofs the
    # batched (2, ndof, ndof) f32 stage inverses fit comfortably (1.1 GB at
    # 11,839) and turn the 10-12-iteration BiCGSTAB stage solves into a
    # handful of refinement matvecs. TPU-only (the inverse is a Pallas GJ
    # with a host-dispatched contraction-probe verdict; probe failure on a
    # late-transient advective batch falls back to the RAS factor for that
    # refresh window — same guard philosophy as solvers/direct.py).
    use_mid_species = (use_ras_factor and ndof <= species_inv_threshold
                       and jax.default_backend() == "tpu")
    _species_dense_probe_j = None
    if use_mid_species:
        from ..solvers.direct import _pallas_inv_probe

        @jax.jit
        def _species_dense_probe_j(uphi_):
            K_pair = _build_K_pair(uphi_)
            A_stage = a_tab[0][1] * M_el[None] + (dt * b_tab[0][1]) * K_pair
            A32 = FA.dense_constrained_matrix_batched(
                A_stage, vt2.dofmap, ndof, free_pair).astype(jnp.float32)
            return _pallas_inv_probe(A32)

    def _poisson_residual(uphi_, ucp_, ucm_):
        ue = uphi_[vt_phi.dofmap]
        r_el = V.poisson_residual_el(ue, ucp_[vt_phi.dofmap], ucm_[vt_phi.dofmap],
                                     vt_phi, sys.l_b, sys.cylindrical, pi)
        r = FA.scatter_add(r_el, vt_phi.dofmap, ndof) + ctx_phi.flux_vector
        return ctx_phi.constrain(r)

    def _poisson_solve(uphi_, ucp_, ucm_, phi_pre_=None):
        """SLP apply at tolerance 1e-10 (reference :349-350).

        ``phi_pre_`` carries the Poisson setup state as a RUNTIME
        ARGUMENT pytree — never a closure constant (the remote compiler
        ships closure constants in the compile request; a 560 MB inverse
        or level-3 RAS factor set trips its body-size limit, HTTP 413):
        dense path (P, q) of the exact affine form phi* = q + P (cm-cp);
        mid-size tier the f32 Poisson inverse for f64-residual
        refinement; large-mesh path the (local inverses, p1 coarse)
        two-level block-RAS factors."""
        if dense_phi_pre is not None:
            P_phi_, q_phi_ = phi_pre_
            return q_phi_ + P_phi_ @ (ucm_ - ucp_), jnp.int32(1)
        r = _poisson_residual(uphi_, ucp_, ucm_)
        if solve_phi_inv is not None:
            x, k = solve_phi_inv(phi_pre_, r[None], 1e-10)
            return uphi_ - x[0], k
        if ras_phi_pre is not None:
            from ..solvers import block_ras as BR
            from ..solvers.krylov import bicgstab
            inv_p, p1_p = phi_pre_
            op_mx = FA.make_constrained_operator_mixed(
                A_phi_el, vt_phi.dofmap, ndof, ctx_phi.free)
            # the preconditioner's internal residual op must match the
            # pass-vector dtype: an f64 op inside the two-level closure
            # silently promoted the f32 inner-Krylov carry (caught by the
            # r4 mixed A/B); preconditioner quality only needs f32
            M_ras = BR.make_two_level_precond(
                ctx_ras, inv_p, None,
                op_mx if mixed_precision else op_phi,
                ctx_phi.free, p1_coarse=p1_p)
            if mixed_precision:
                # f32-operator passes at 1e-5 with exact f64 residuals
                # between them (mixed-precision iterative refinement).
                # r3 hard-coded TWO passes; now the loop CHECKS the true
                # f64 residual and runs passes until the 1e-10 target
                # (bounded) — mandatory once krylov_f32_inner also drops
                # the pass VECTORS to f32 (each pass's true reduction
                # then has an f32 floor; extra passes recover it).

                # POISSON PASSES KEEP f64 VECTORS: the r4 A/B measured
                # f32-vector BiCGSTAB stagnating on the cold 46k Poisson
                # (2824 its vs 23 with f64 vectors, even with
                # f64-accumulated dots and outer restarts) — the
                # two-level-preconditioned elliptic solve is where the
                # f32 recurrence breaks; the advective stage solves and
                # PB Newton corrections (10-22 its) run f32 fine. The
                # capped pass budget + f64-residual restarts stay: they
                # bound any stagnating pass.
                # 128 so even a fully stalled pass pair (the
                # noise-floor re-solve case) stays well under the ~100 s
                # device watchdog at L3 iteration costs
                pass_cap = min(int(sys.linearSolverIterations), 128)

                def _pass(rhs):
                    res = bicgstab(op_mx, rhs, jnp.zeros_like(rhs), M_ras,
                                   1e-5, pass_cap)
                    return res.x, res.iterations

                norm_r = jnp.linalg.norm(r)
                tol10 = 1e-10 * norm_r

                def p_cond(state):
                    _, rk, _, p, nk_prev = state
                    nk = jnp.linalg.norm(rk)
                    # progress exit: a pass that fails to cut the true
                    # residual (e.g. re-solving an already-converged
                    # system, where tol10 sits below the noise floor)
                    # must NOT spin — an unbounded pass loop ran minutes
                    # and tripped the TPU watchdog (r4 device fault,
                    # tools/ab_mixed logs)
                    return (jnp.isfinite(nk) & (nk > tol10)
                            & (nk <= 0.5 * nk_prev) & (p < 8))

                def p_body(state):
                    x, rk, k, p, _ = state
                    nk_prev = jnp.linalg.norm(rk)
                    xp, kp = _pass(rk)
                    x = x + xp
                    rk = ctx_phi.constrain(r - op_phi(x))
                    return x, rk, k + kp, p + 1, nk_prev

                x1, k1 = _pass(r)
                r1 = ctx_phi.constrain(r - op_phi(x1))
                x, _, k, _, _ = jax.lax.while_loop(
                    p_cond, p_body, (x1, r1, k1, jnp.int32(1), norm_r))
                return uphi_ - x, k
            res = bicgstab(op_phi, r, jnp.zeros_like(r), M_ras, 1e-10,
                           sys.linearSolverIterations)
            return uphi_ - res.x, res.iterations
        res = krylov_phi(op_phi, r, jnp.zeros_like(r), diag_phi, 1e-10,
                         lam=lam_phi, A_el=A_phi_el)
        return uphi_ - res.x, res.iterations

    def _fused_step(uphi_, ucp_, ucm_, phi_pre_=None):
        ucp_, ucm_, _ = _species_step(uphi_, ucp_, ucm_)
        uphi_, _ = _poisson_solve(uphi_, ucp_, ucm_, phi_pre_)
        return uphi_, ucp_, ucm_

    def _scan_steps_impl(state, phi_pre_, n_steps: int):
        """n_steps fused steps as one lax.scan (potentialUpdateFreq == 1)."""

        def body(carry, _):
            return _fused_step(*carry, phi_pre_), None

        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    # the step count is a static argument; the hoisted-jit wrapper takes
    # array pytrees only, so bind it per count instead of static_argnums
    _scan_progs = {}

    def _scan_steps_j(state, n_steps: int, phi_pre_=None):
        if n_steps not in _scan_progs:
            _scan_progs[n_steps] = _jit(functools.partial(
                _scan_steps_impl, n_steps=n_steps))
        return _scan_progs[n_steps](state, phi_pre_)

    # public wrappers keep the (uphi, ucp, ucm) signatures and pass the
    # (possibly None) Poisson setup pytree as a runtime argument each call
    phi_pre = (dense_phi_pre if dense_phi_pre is not None else
               phi_inv if phi_inv is not None else ras_phi_pre)
    _ps_j = _jit(_poisson_solve)
    _fs_j = _jit(_fused_step)

    def _make_fused_reuse(step_fn):
        def f(factor, uphi_, ucp_, ucm_, phi_pre_=None):
            ucp2, ucm2, _ = step_fn(factor, uphi_, ucp_, ucm_)
            uphi2, _ = _poisson_solve(uphi_, ucp2, ucm2, phi_pre_)
            return uphi2, ucp2, ucm2
        return f

    _factor_pub = _ssr_pub = _fsr_pub = _factor_kind = None
    if use_dense_species:
        _factor_pub = jax.jit(_species_factor)
        _ssr_pub = jax.jit(_species_step_reuse)
        _fsr_d = jax.jit(_make_fused_reuse(_species_step_reuse))
        _fsr_pub = lambda f, u, cp, cm: _fsr_d(f, u, cp, cm, phi_pre)
        _factor_kind = "dense"
    elif use_mid_species:
        # host-dispatched factor kind: every refresh runs the Pallas
        # inverse + probe as one program, fetches the scalar verdict, and
        # on failure builds the RAS factor instead; the reuse steps then
        # dispatch to the matching jitted program by the static tag
        _far_j = jax.jit(_species_factor_ras)
        _ssr_inv_j = jax.jit(_species_step_reuse)
        _ssr_ras_j = jax.jit(_species_step_reuse_ras)
        _fsr_inv_j = jax.jit(_make_fused_reuse(_species_step_reuse))
        _fsr_ras_j = jax.jit(_make_fused_reuse(_species_step_reuse_ras))

        def _factor_pub(uphi_):
            X, ok = _species_dense_probe_j(uphi_)
            if bool(ok):
                return ("inv", X)
            return ("ras", _far_j(uphi_))

        def _ssr_pub(factor, uphi_, ucp_, ucm_):
            kind, val = factor
            return (_ssr_inv_j if kind == "inv" else _ssr_ras_j)(
                val, uphi_, ucp_, ucm_)

        def _fsr_pub(factor, u, cp, cm):
            kind, val = factor
            return (_fsr_inv_j if kind == "inv" else _fsr_ras_j)(
                val, u, cp, cm, phi_pre)

        _factor_kind = "ras"
    elif use_ras_factor:
        if _split_factor:
            from ..solvers import block_ras as BR
            # THREE programs at level 4, not one: the fused
            # K_pair+assembly program RESOURCE_EXHAUSTs under the
            # driver's residents (tools/l4_probe_r5k.log — the sync
            # pinned it on the ASSEMBLY, not the inversion): XLA remats
            # the (2, E, 3, 3) f64 stage matrices into lane-padded
            # copies (~42x on (3, 3) minors, the r4 OOM class; ~9 GB at
            # 1.47M elements). Materializing the stage matrices as an
            # f32 STORED array between programs forces the E-minor
            # layout (stored arrays get E-minor, r4 lesson) and halves
            # the bytes; the f32 cast is free (assembly casts anyway).
            @_jit
            def _stage32_j(uphi_):
                K_pair = _build_K_pair(uphi_)
                return (a_tab[0][1] * M_el[None]
                        + (dt * b_tab[0][1]) * K_pair).astype(jnp.float32)

            # ... and the batched assembly runs PER SYSTEM through the
            # 3-d path: the (S, K, L, L) variant's final (K, S) -> (S, K)
            # transpose holds two ~4.6 GB lane-padded buffers at once
            # and still OOMs under the driver's residents
            # (tools/l4_probe_r5l.log); per-system (K, L, L) programs
            # write into one donated (S, K, L, L) buffer instead.
            @_jit
            def _slice_sys_j(A32, s):
                return jax.lax.dynamic_slice(
                    A32, (s,) + (jnp.int32(0),) * 3,
                    (1,) + A32.shape[1:])[0], jnp.take(free_pair, s, axis=0)

            @_jit
            def _asm1_j(A32s, free_s):
                return BR.assemble_local_matrices(ctx_ras, A32s, free_s)

            @_jit
            def _p1_j(A32):
                # f32 stage matrices feed the coarse: preconditioner-
                # side Galerkin product, f32-safe
                return (BR.build_p1_coarse_batched(
                    ctx_ras, A32, vt2.dofmap, free_pair, space.dof_coords)
                    if species_two_level else None)

            _zeros_loc_j = jax.jit(
                lambda: jnp.zeros((2, ctx_ras.K, ctx_ras.L, ctx_ras.L),
                                  jnp.float32))

            # host-orchestrated chunked in-place inversion (L4 HBM)
            _inv_j = BR.invert_local_matrices_outofcore
            _sync = os.environ.get("PNP_TPU_SYNC_FACTOR")

            def _factor_pub(uphi_):
                A32 = _stage32_j(uphi_)
                if _sync:
                    # diagnostic: attribute async RESOURCE_EXHAUSTED
                    # per program (L4 bring-up)
                    jax.block_until_ready(A32)
                p1 = _p1_j(A32) if species_two_level else None
                A_loc = _zeros_loc_j()
                for s in range(2):
                    A32s, free_s = _slice_sys_j(A32, jnp.int32(s))
                    part = _asm1_j(A32s, free_s)
                    A_loc = BR._ooc_set_system(A_loc, part, jnp.int32(s))
                    if _sync:
                        jax.block_until_ready(A_loc)
                del A32
                inv = _inv_j(A_loc)
                return (inv, p1) if species_two_level else inv

            # the REUSE STEP splits the same way: compiling the K_pair
            # build INSIDE the Krylov while_loop remats the gradphi
            # tables into an 11.2 GB lane-padded copy (42.7x,
            # tools/l4_probe_r5m.log compile OOM at 34.15 G) — K_pair
            # runs as its own (proven) program and enters the solve as
            # a runtime argument in its stored E-minor layout
            # ... and even a STANDALONE whole-E K_pair program (f64 OR
            # f32 output) compile-OOMs on the same 11.2 GB padded remat
            # (tools/l4_probe_r5n.log, r5o.log) — so K_pair builds in
            # HOST-level element chunks: one small program slices the
            # tables dynamically and emits a (2, CE, 3, 3) f32 chunk,
            # written into a donated buffer; the last chunk overlaps
            # backward (reads are from immutable tables, overlapped
            # writes are identical values). f32 is fine here: this
            # path's stage solves are mixed-precision f32 already
            # (1e-5 stage tolerance, f32 drift entries ~1e-7-accurate).
            _E2 = vt2.num_elements
            _CE = min(65536, _E2)
            _n_kch = -(-_E2 // _CE)

            @_jit
            def _kchunk_j(uphi_, start):
                z = jnp.int32(0)
                gp = jax.lax.dynamic_slice(
                    vt2.gradphi, (start, z, z, z),
                    (_CE,) + vt2.gradphi.shape[1:])
                qw = jax.lax.dynamic_slice(vt2.qw, (start, z),
                                           (_CE, vt2.qw.shape[1]))
                qy = jax.lax.dynamic_slice(vt2.qy, (start, z),
                                           (_CE, vt2.qy.shape[1]))
                dm = jax.lax.dynamic_slice(vt2.dofmap, (start, z),
                                           (_CE, vt2.dofmap.shape[1]))
                tc = dataclasses.replace(vt2, gradphi=gp, qw=qw, qy=qy)
                gphi = interp_grad(uphi_[dm], gp)
                return jnp.stack([
                    V.drift_diffusion_jacobian_el(gphi, tc, +1.0, False,
                                                  pi),
                    V.drift_diffusion_jacobian_el(gphi, tc, -1.0, False,
                                                  pi)]).astype(jnp.float32)

            _zeros_kpair_j = jax.jit(
                lambda: jnp.zeros((2, _E2, 3, 3), jnp.float32))

            @functools.partial(jax.jit, donate_argnums=0)
            def _kpair_set_j(buf, blk, start):
                z = jnp.int32(0)
                return jax.lax.dynamic_update_slice(buf, blk,
                                                    (z, start, z, z))

            def _kpair_j(uphi_):
                buf = _zeros_kpair_j()
                for i in range(_n_kch):
                    start = jnp.int32(min(i * _CE, _E2 - _CE))
                    buf = _kpair_set_j(buf, _kchunk_j(uphi_, start), start)
                return buf

            @_jit
            def _step_with_kpair(K_pair, ras_inv, ucp_, ucm_):
                out, iters = _species_pair_onestep(
                    K_pair, jnp.stack([ucp_, ucm_]), None, ras_inv,
                    huge_mesh=True)
                return out[0], out[1], iters

            def _ssr_pub(factor, uphi_, ucp_, ucm_):
                return _step_with_kpair(_kpair_j(uphi_), factor,
                                        ucp_, ucm_)

            def _fsr_pub(factor, u, cp, cm):
                cp2, cm2, _ = _ssr_pub(factor, u, cp, cm)
                u2, _ = _ps_j(u, cp2, cm2, phi_pre)
                return u2, cp2, cm2
        else:
            _factor_pub = _jit(_species_factor_ras)
            _ssr_pub = _jit(_species_step_reuse_ras)
            _fsr_r = _jit(_make_fused_reuse(_species_step_reuse_ras))
            _fsr_pub = lambda f, u, cp, cm: _fsr_r(f, u, cp, cm, phi_pre)
        _factor_kind = "ras"

    return PnpSystem(
        sys=sys, space=space, pb=pb, pb_newton_iterations=pb_iters,
        uphi0=uphi0, ucp0=ucp0, ucm0=ucm0,
        species_step=_jit(_species_step),
        poisson_solve=lambda u, cp, cm: _ps_j(u, cp, cm, phi_pre),
        fused_step=lambda u, cp, cm: _fs_j(u, cp, cm, phi_pre),
        scan_steps=lambda state, n: _scan_steps_j(state, n, phi_pre),
        ionflux_tables=build_ionflux_tables(space, sys.cylindrical, pi,
                                            sys.n_surfaces),
        dt=dt,
        species_factor=_factor_pub,
        species_step_reuse=_ssr_pub,
        factor_kind=_factor_kind,
        fused_step_reuse=_fsr_pub,
        species_dense_f32=(jax.jit(_species_dense_f32)
                           if use_dense_species else None))


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
    ras_refresh_every: Optional[int] = None,
    mixed_precision: Optional[bool] = None,
    poisson_inv_threshold: int = 49152,
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
    if ras_refresh_every is None:
        # large-mesh default (r3): amortize the stage factorization over 4
        # steps — stale factors only raise solver iteration counts (stage
        # solves stay 1e-5-residual-exact), measured ~20% step-time saving
        # at 46k nodes; the dense flagship path keeps per-step factors
        # (LU-reuse measured 10x slower there, CLAUDE.md r1)
        ras_refresh_every = 4 if system.factor_kind == "ras" else 1
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
            # keyed on the ABSOLUTE step so a checkpoint-resumed run shares
            # the uninterrupted run's factor-staleness schedule (ADVICE r3)
            if ras_factor is None or i % ras_refresh_every == 0:
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

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

TPU-native structure: one jitted ``species_step`` (both DIRK stages of both
species) + one jitted Poisson SLP apply; steps between outputs run in a
``lax.scan`` when the update cadence allows it.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

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
    checkpoint_path: Optional[str] = None,
    checkpoint_freq: int = 0,
    resume: bool = False,
    flux_convention: str = "reference",
) -> PnpRunResult:
    mesh = space.mesh
    n_steps = sys.nSteps if n_steps is None else n_steps
    tab = tableau if tableau is not None else alexander2()
    dt = sys.tau
    pi = sys.pi

    # ---- Phase A: PB bootstrap ------------------------------------------
    pb_res = solve_pb(sys, space)
    pb = pb_res.u

    # ---- Phase B: spaces, constraints, initial fields -------------------
    ctx_phi = make_scalar_context(sys, space, component=0, quad_order=3)
    free_cp = jnp.asarray(C.free_dof_mask(space, sys, 1))
    free_cm = jnp.asarray(C.free_dof_mask(space, sys, 2))
    g_cp = jnp.asarray(C.dirichlet_dof_values(space, sys, 1))
    g_cm = jnp.asarray(C.dirichlet_dof_values(space, sys, 2))

    uphi = jnp.asarray(C.interpolate_with_pb_fallback(space, sys, 0, np.asarray(pb)))
    ucp = jnp.asarray(C.interpolate_with_pb_fallback(space, sys, 1, np.asarray(pb)))
    ucm = jnp.asarray(C.interpolate_with_pb_fallback(space, sys, 2, np.asarray(pb)))

    # ---- Phase C: operators & solvers -----------------------------------
    vt2 = build_volume_tables(space, 2)   # species spatial, order 2
    vt5 = build_volume_tables(space, 5)   # species mass, order 5
    dofmap = ctx_phi.dofmap
    ndof = space.ndof

    # species mass blocks: planar metric (reference behavior)
    M_el = V.mass_jacobian_el(vt5, 1.0, False, pi)
    A_phi_el = V.poisson_jacobian_el(ctx_phi.vt, sys.cylindrical, pi)
    diag_phi = FA.constrained_diagonal(A_phi_el, dofmap, ndof, ctx_phi.free)
    op_phi = FA.make_constrained_operator(A_phi_el, dofmap, ndof, ctx_phi.free)

    krylov = make_krylov_solver(sys.linearSolver, sys.linearSolverIterations)
    a_tab = [[float(v) for v in row] for row in tab.A]
    b_tab = [[float(v) for v in row] for row in tab.B]
    stages = tab.stages

    def _species_onestep(K_el, u_old, free, g):
        """All DIRK stages for one species (linear stage solves)."""

        def mass(u):
            return FA.spmv(M_el, u, dofmap, ndof)

        def alpha(u):
            return FA.spmv(K_el, u, dofmap, ndof)

        levels = [u_old]
        iters = jnp.int32(0)
        for i in range(stages):
            a_ii, b_ii = a_tab[i][i + 1], b_tab[i][i + 1]
            hist = jnp.zeros(ndof)
            for j in range(i + 1):
                if a_tab[i][j] != 0.0:
                    hist = hist + a_tab[i][j] * mass(levels[j])
                if b_tab[i][j] != 0.0:
                    hist = hist + dt * b_tab[i][j] * alpha(levels[j])
            guess = jnp.where(free, levels[-1], g)
            A_el = a_ii * M_el + (dt * b_ii) * K_el
            r = hist + a_ii * mass(guess) + dt * b_ii * alpha(guess)
            r = jnp.where(free, r, 0.0)
            op = FA.make_constrained_operator(A_el, dofmap, ndof, free)
            dg = FA.constrained_diagonal(A_el, dofmap, ndof, free)
            res = krylov(op, r, jnp.zeros_like(r), dg, 1e-5)
            levels.append(guess - res.x)
            iters = iters + res.iterations
        return levels[-1], iters

    @jax.jit
    def species_step(uphi_, ucp_, ucm_):
        gphi = interp_grad(uphi_[dofmap], vt2.gradphi)
        K_cp = V.drift_diffusion_jacobian_el(gphi, vt2, +1.0, False, pi)
        K_cm = V.drift_diffusion_jacobian_el(gphi, vt2, -1.0, False, pi)
        ucp_new, it1 = _species_onestep(K_cp, ucp_, free_cp, g_cp)
        ucm_new, it2 = _species_onestep(K_cm, ucm_, free_cm, g_cm)
        return ucp_new, ucm_new, it1 + it2

    @jax.jit
    def poisson_solve(uphi_, ucp_, ucm_):
        """SLP apply at tolerance 1e-10 (reference :349-350)."""
        ue = uphi_[dofmap]
        r_el = V.poisson_residual_el(ue, ucp_[dofmap], ucm_[dofmap],
                                     ctx_phi.vt, sys.l_b, sys.cylindrical, pi)
        r = ctx_phi.scatter(r_el) + ctx_phi.flux_vector
        r = ctx_phi.constrain(r)
        res = krylov(op_phi, r, jnp.zeros_like(r), diag_phi, 1e-10)
        return uphi_ - res.x, res.iterations

    ionflux_tables = build_ionflux_tables(space, sys.cylindrical, pi,
                                          sys.n_surfaces)

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
    for i in range(start_step, n_steps):
        ucp, ucm, _ = species_step(uphi, ucp, ucm)
        time += dt
        if i % sys.potentialUpdateFreq == 0:
            uphi, _ = poisson_solve(uphi, ucp, ucm)
        if i % sys.outputFreq == 0:
            output_counter += 1
            ip, im = calc_ion_flux(ionflux_tables, uphi, ucp, ucm,
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

    uphi, _ = poisson_solve(uphi, ucp, ucm)   # final solve (reference :454)
    if current_writer:
        current_writer.close()
    return PnpRunResult(
        phi=uphi, cp=ucp, cm=ucm, time=time, steps=n_steps,
        pb_newton_iterations=pb_res.iterations,
        current_history=history, space=space)

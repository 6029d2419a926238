"""Numerical study: does in-block partial pivoting fix the Pallas GJ
inverse on the real late-transient pore stage matrices?

Runs the pore production transient on CPU, extracts the batched f32
constrained stage matrices (the exact preconditioner targets of
workloads/instationary_pnp_from_pb._species_dense_f32) at a sequence of
steps, and simulates the blocked Gauss-Jordan of
operators/pallas_kernels.batched_inverse_pallas in numpy f32 — both the
shipped no-pivot elimination and an in-block partially-pivoted variant —
reporting max |inv A - I| per step. This is the decision artifact for
making the Pallas inverse the default production inverse.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

B = 128


def gj_small_nopivot(P):
    n = P.shape[0]
    P = P.copy()
    for r in range(n):
        piv = P[r, r]
        ipiv = np.float32(1.0) / piv
        row = P[r] * ipiv
        c = P[:, r].copy()
        P -= np.outer(c, row).astype(np.float32)
        P[r] = row
        P[:, r] = -c * ipiv
        P[r, r] = ipiv
    return P


def gj_small_pivot(P):
    """In-block partial pivoting: swap rows during elimination, unswap
    columns (reverse order) at the end — mirrors the planned kernel."""
    n = P.shape[0]
    P = P.copy()
    perm = np.arange(n)
    for r in range(n):
        p = r + int(np.argmax(np.abs(P[r:, r])))
        if p != r:
            P[[r, p]] = P[[p, r]]
        perm[r] = p
        piv = P[r, r]
        ipiv = np.float32(1.0) / piv
        row = P[r] * ipiv
        c = P[:, r].copy()
        P -= np.outer(c, row).astype(np.float32)
        P[r] = row
        P[:, r] = -c * ipiv
        P[r, r] = ipiv
    for r in range(n - 1, -1, -1):
        p = perm[r]
        if p != r:
            P[:, [r, p]] = P[:, [p, r]]
    return P


def blocked_gj(A, small_inv):
    """The exact blocked algorithm of batched_inverse_pallas, numpy f32."""
    N = A.shape[0]
    assert N % B == 0
    NI = N // B
    A = A.copy()
    for k in range(NI):
        ks = slice(k * B, (k + 1) * B)
        P = small_inv(A[ks, ks])
        R = (P @ A[ks, :]).astype(np.float32)
        R[:, ks] = P
        A[ks, :] = R
        for i in range(1, NI):
            r = (k + i) % NI
            rs = slice(r * B, (r + 1) * B)
            C = A[rs, ks].copy()
            A[rs, :] -= (C @ R).astype(np.float32)
            A[rs, ks] -= C
    return A


def equilibrate(A):
    d = np.abs(np.diag(A))
    s = 1.0 / np.sqrt(np.maximum(d, 1e-30))
    return (A * s[:, None] * s[None, :]).astype(np.float32), s


def pad_to(A, N):
    N0 = A.shape[0]
    if N0 == N:
        return A
    out = np.eye(N, dtype=np.float32)
    out[:N0, :N0] = A
    return out


def study(A0, label):
    N0 = A0.shape[0]
    N = ((N0 + B - 1) // B) * B
    Ae, s = equilibrate(A0)
    Ap = pad_to(Ae, N)
    I = np.eye(N0, dtype=np.float32)
    out = {}
    for name, fn in (("nopivot", gj_small_nopivot), ("pivot", gj_small_pivot)):
        inv = blocked_gj(Ap, fn)[:N0, :N0] * s[:, None] * s[None, :]
        if not np.isfinite(inv).all():
            out[name] = "NONFINITE"
        else:
            err = float(np.max(np.abs(
                (inv.astype(np.float64) @ A0.astype(np.float64)) - I)))
            out[name] = f"{err:.2e}"
    print(f"{label}: nopivot={out['nopivot']} pivot={out['pivot']}",
          flush=True)
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from pnp_tpu.config import read_config
    from pnp_tpu.fem import assembly as FA
    from pnp_tpu.fem import constraints as C
    from pnp_tpu.fem.geometry import build_volume_tables
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.operators import volume as V
    from pnp_tpu.operators.common import interp_grad
    from pnp_tpu.timestepping.tableaux import alexander2
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system

    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    system = build_pnp_system(cfg, space)
    tab = alexander2()
    a11, b11 = float(tab.A[0][1]), float(tab.B[0][1])
    vt2 = build_volume_tables(space, 2)
    vt5 = build_volume_tables(space, 5)
    M_el = V.mass_jacobian_el(vt5, 1.0, False, cfg.pi)
    free_pair = jnp.stack([jnp.asarray(C.free_dof_mask(space, cfg, 1)),
                           jnp.asarray(C.free_dof_mask(space, cfg, 2))])

    def stage_dense(uphi):
        gphi = interp_grad(uphi[vt2.dofmap], vt2.gradphi)
        K = jnp.stack([
            V.drift_diffusion_jacobian_el(gphi, vt2, +1.0, False, cfg.pi),
            V.drift_diffusion_jacobian_el(gphi, vt2, -1.0, False, cfg.pi)])
        A = a11 * M_el[None] + (cfg.tau * b11) * K
        return np.asarray(FA.dense_constrained_matrix_batched(
            A, vt2.dofmap, space.ndof, free_pair)).astype(np.float32)

    state = (system.uphi0, system.ucp0, system.ucm0)
    checkpoints = {1, 3, 5, 10, 20, 40}
    mats = {0: stage_dense(state[0])}
    for step in range(1, max(checkpoints) + 1):
        state = system.fused_step(*state)
        if step in checkpoints:
            if not bool(jnp.isfinite(state[0]).all()):
                print(f"state non-finite at step {step}; stopping", flush=True)
                break
            mats[step] = stage_dense(state[0])
    np.savez_compressed("/tmp/pore_stage_mats.npz",
                        **{f"s{k}_{sp}": m[sp] for k, m in mats.items()
                           for sp in (0, 1)})
    for k in sorted(mats):
        for sp in (0, 1):
            study(mats[k][sp], f"step{k:3d} species{sp}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""Flagship species-inverse study (VERDICT r3 item 2).

The flagship step is 49.8 ms; the species stage 44.3 of it; the XLA f32
explicit inversion of the batched (2, 3048, 3048) stage matrices ~26 ms.
This tool measures, on the real production transient (not synthetic
matrices), every candidate replacement's cost AND preconditioner quality:

  A. _xla_inv_f32 at HIGHEST (the shipping default) — baseline;
  B. XLA inversion at DEFAULT matmul precision (bf16 passes): if the
     probe-gated contraction is still good, this is a free ~x-speedup
     (the r1 "HIGHEST everywhere" rule was measured on the APPLY path);
  C. Newton-Schulz refresh of the PREVIOUS step's inverse:
     X <- X (2I - A X) at HIGHEST, k=1/2 steps — 2 MXU matmuls per step
     each ~3.4 ms at speed of light vs the 26 ms inversion; quality
     depends on the step-to-step drift ||I - A_new X_prev||;
  D. Pallas blocked GJ (the r3-declined kernel) for reference.

Per production step it records the refinement-probe contraction and the
ACTUAL stage-solve refinement counts each factor variant produces, so a
variant's end-to-end step economics (factor cost + extra refinement
applies) can be computed honestly. Run via run_in_background, >=25 min
timeout (remote-compile variance).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main(n_steps=60):
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.workloads.instationary_pnp_from_pb import build_pnp_system
    from pnp_tpu.solvers.direct import contraction_ok

    assert jax.default_backend() == "tpu", "study needs the TPU"
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    cfg.linearSolverIterations = 3000
    space = FunctionSpace(read_gmsh(cfg.meshfile), 1)
    N = space.ndof
    print(f"ndof={N}", flush=True)
    system = build_pnp_system(cfg, space)

    # --- microbench: the primitives -----------------------------------
    A0 = jnp.asarray(np.random.RandomState(0).standard_normal(
        (2, N, N)).astype(np.float32)) / N + 4.0 * jnp.eye(N,
                                                           dtype=jnp.float32)

    def timeit(label, fn, *a, n=6):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)                      # same args: measures program
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"  {label}: {ms:.2f} ms", flush=True)
        return ms

    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def inv_hi(a):
        with jax.default_matmul_precision("highest"):
            return jnp.linalg.inv(a)

    @jax.jit
    def inv_def(a):
        return jnp.linalg.inv(a)

    @jax.jit
    def lu_hi(a):
        with jax.default_matmul_precision("highest"):
            return jax.vmap(jax.scipy.linalg.lu_factor)(a)

    @jax.jit
    def mm_hi(a, b):
        return jnp.matmul(a, b, precision=hi)

    @jax.jit
    def mm_def(a, b):
        return jnp.matmul(a, b)

    @jax.jit
    def ns1(a, x):
        return 2.0 * x - jnp.matmul(x, jnp.matmul(a, x, precision=hi),
                                    precision=hi)

    from pnp_tpu.operators.pallas_kernels import batched_inverse_pallas

    @jax.jit
    def gj(a):
        return batched_inverse_pallas(a)

    @jax.jit
    def gj_probe(a):
        from pnp_tpu.solvers.direct import _pallas_inv_probe
        return _pallas_inv_probe(a)

    print("[microbench] batched (2, N, N) primitives:", flush=True)
    timeit("inv HIGHEST", inv_hi, A0)
    timeit("inv default", inv_def, A0)
    timeit("lu_factor HIGHEST", lu_hi, A0)
    X0 = inv_hi(A0)
    timeit("matmul HIGHEST", mm_hi, A0, X0)
    timeit("matmul default", mm_def, A0, X0)
    timeit("NS step (2 matmul HIGHEST)", ns1, A0, X0)
    try:
        timeit("Pallas GJ", gj, A0)
        timeit("Pallas GJ + rough probe", gj_probe, A0)
    except Exception as e:
        print(f"  Pallas GJ failed: {str(e)[:200]}", flush=True)

    # --- production transient: quality per variant --------------------
    # reach the dense-f32 stage matrices through the system's own builder
    from pnp_tpu.workloads import instationary_pnp_from_pb as W

    # rebuild the internal pieces: _species_dense_f32 is a closure; use
    # the public factor + a probe of refinement counts via
    # species_step_reuse (its `iters` output IS the refinement count on
    # the dense path)
    uphi, ucp, ucm = system.uphi0, system.ucp0, system.ucm0

    @jax.jit
    def ns_update(X, A32):
        with jax.default_matmul_precision("highest"):
            AX = jnp.matmul(A32, X)
            X1 = 2.0 * X - jnp.matmul(X, AX)
        return X1

    @jax.jit
    def ns_update2(X, A32):
        return ns_update(ns_update(X, A32), A32)

    # the factor program returns the explicit inverse on the dense path;
    # to get A32 itself we recompute from element blocks via the dense
    # species builder inside build_pnp_system — exposed for tooling as
    # system.species_dense_f32 if present, else rebuild here
    dense_f32 = getattr(system, "species_dense_f32", None)
    if dense_f32 is None:
        print("system lacks species_dense_f32 hook; abort", flush=True)
        return

    probe_j = jax.jit(contraction_ok)

    X_prev = None
    print("[transient] per-step variant quality "
          "(fresh=its with fresh inv, ns1/ns2=its with NS-refreshed "
          "prev inverse, def=its with default-precision inv):", flush=True)
    for i in range(n_steps):
        A32 = dense_f32(uphi)
        X_fresh = inv_hi(A32)
        row = {"step": i}
        variants = {"fresh": X_fresh}
        try:
            X_gj, gj_ok = gj_probe(A32)
            row["gj_probe"] = "ok" if bool(gj_ok) else "FAIL"
            variants["gj"] = X_gj
        except Exception as e:
            row["gj_probe"] = f"ERR:{str(e)[:60]}"
        if X_prev is not None:
            variants["stale"] = X_prev
        for name, X in variants.items():
            ok = bool(probe_j(A32, X))
            _, _, its = system.species_step_reuse(X, uphi, ucp, ucm)
            row[name] = f"{'ok' if ok else 'FAIL'}/{int(its)}"
        print("  " + " ".join(f"{k}={v}" for k, v in row.items()),
              flush=True)
        # advance the transient with the production step
        uphi, ucp, ucm = system.fused_step(uphi, ucp, ucm)
        X_prev = X_fresh
    fin = bool(jnp.isfinite(uphi).all() & jnp.isfinite(ucp).all()
               & jnp.isfinite(ucm).all())
    print(f"final state finite: {fin}", flush=True)
    print("INVERSE-STUDY-OK", flush=True)


if __name__ == "__main__":
    main()

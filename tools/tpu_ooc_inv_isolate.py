"""Isolate the L4 worker crash: synthetic out-of-core batch inversion.

Every "TPU worker process crashed or restarted" since r5f involves the
out-of-core chunked inversion of L4-shaped factor batches
(tools/l4_probe_r5{g,h,i}.log, l4_species_probe_r5.log), while equally
heavy non-L4 jobs (full bench incl. L3) run clean. This synthesizes a
well-conditioned (2, 2883, 403, 403) f32 batch directly on device (no
mesh, no assembly) and runs:

  A. the shipping out-of-core loop with XLA getrf chunks
     (PNP_TPU_INV_CHUNK, default 256);
  B. the same loop with Pallas GJ chunks (in-block pivoting, in-place);

printing per-chunk progress so the crashing program is identifiable.
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pnp_tpu.solvers import block_ras as BR

    assert jax.default_backend() == "tpu"
    S, K, L = 2, 2883, 403
    C = int(os.environ.get("PNP_TPU_INV_CHUNK", "256"))

    @jax.jit
    def make_batch(key):
        # diagonally dominant, well conditioned, unique per (s, k)
        base = jax.random.normal(key, (S, K, L, L), jnp.float32) * 0.1
        d = 3.0 + jnp.arange(L, dtype=jnp.float32) / L
        return base + jnp.diag(d)[None, None]

    t0 = time.perf_counter()
    A = make_batch(jax.random.PRNGKey(0))
    jax.block_until_ready(A)
    print(f"batch built: {time.perf_counter() - t0:.1f} s "
          f"{A.shape} {A.nbytes/2**30:.2f} GiB", flush=True)

    # the first in-place update DONATES A's buffer — snapshot the spot-
    # check blocks to host before inverting
    A07 = jnp.asarray(np.asarray(A[0, 7]))
    A_last = jnp.asarray(np.asarray(A[1, K - 1]))
    t0 = time.perf_counter()
    X = BR.invert_local_matrices_outofcore(A, chunk=C)
    err = float(jnp.abs(A07 @ X[0, 7] - jnp.eye(L)).max())  # forces sync
    print(f"[ooc chunk={C}] done {time.perf_counter() - t0:.1f} s | "
          f"||A X - I||_max (block 7) = {err:.2e}", flush=True)
    kr = K - (K // C) * C
    err_r = float(jnp.abs(A_last @ X[1, K - 1] - jnp.eye(L)).max())
    print(f"[ooc] remainder rows ({kr}) last-block err = {err_r:.2e}",
          flush=True)
    assert err < 1e-2 and err_r < 1e-2
    print("OOC-ISOLATE-OK", flush=True)


if __name__ == "__main__":
    main()

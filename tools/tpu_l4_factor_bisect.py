"""Split the L4 PB assemble OOM: jacobian vs local-matrix assembly vs
batched inverse (XLA getrf vs Pallas GJ) — each phase survives failure
so one run maps the whole space."""

import functools
import sys
import time
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def attempt(tag, fn, *args):
    for trial in range(2):
        try:
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            print(f"  [{tag}] OK {time.perf_counter() - t0:.1f} s",
                  flush=True)
            return out
        except Exception as e:
            print(f"  [{tag}] trial {trial} FAIL: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    return None


def main(levels=4):
    from pnp_tpu.config import read_config
    from pnp_tpu.fem.space import FunctionSpace
    from pnp_tpu.meshio import read_gmsh
    from pnp_tpu.meshio.refine import refine_uniform
    from pnp_tpu.workloads.common import make_scalar_context
    from pnp_tpu.operators import volume as V
    from pnp_tpu.solvers import block_ras as BR
    from pnp_tpu.utils.hoist import jit_hoisted

    assert jax.default_backend() == "tpu"
    cfg = read_config("/root/reference/test/pore_pnp/pore.cfg")
    mesh = refine_uniform(read_gmsh(cfg.meshfile), levels)
    space = FunctionSpace(mesh, 1)
    print(f"ndof={space.ndof} E={mesh.num_tris}", flush=True)
    ctx = make_scalar_context(cfg, space, component=0, quad_order=3)
    ctx_ras = BR.build_block_context_for_space(space, 256)
    K, L = ctx_ras.K, ctx_ras.L
    print(f"K={K} L={L}", flush=True)
    sys_ = ctx.sys

    def jac(u):
        ue = u[ctx.dofmap]
        return V.pb_jacobian_el(ue, ctx.vt, sys_.l_b, sys_.c0,
                                sys_.cylindrical, sys_.pi)

    u = jnp.zeros(ctx.ndof)
    A_el = attempt("jac", jit_hoisted(jac), u)
    if A_el is None:
        return

    # the chunked local-matrix assembly WITHOUT the inverse
    def assemble_only(a_el):
        A32 = a_el.astype(jnp.float32)[None]
        f_loc_t = BR._gather_padded(
            ctx_ras, ctx.free.astype(jnp.float32)[None]).swapaxes(0, 1)
        n = ctx_ras.elem_dof_local.shape[2]

        def _assemble(eids, edl, f_c):
            Kc = eids.shape[0]
            Ae = jnp.take(A32, eids.reshape(-1), axis=1).reshape(
                1, Kc, -1, n, n)
            s_ix = jnp.arange(1)[:, None, None, None, None]
            k_ix = jnp.arange(Kc)[None, :, None, None, None]
            rows = edl[None, :, :, :, None]
            cols = edl[None, :, :, None, :]
            A = jnp.zeros((1, Kc, L + 1, L + 1), jnp.float32)
            A = A.at[s_ix, k_ix, rows, cols].add(Ae)[:, :, :L, :L]
            fl = f_c.swapaxes(0, 1)
            A = A * fl[:, :, :, None] * fl[:, :, None, :]
            A = A + jax.vmap(jax.vmap(jnp.diag))(1.0 - fl)
            return A.swapaxes(0, 1)

        from pnp_tpu.operators.common import map_element_chunks
        return map_element_chunks(
            _assemble, (ctx_ras.elem_ids, ctx_ras.elem_dof_local, f_loc_t),
            chunk=256).swapaxes(0, 1)[0]

    A_loc = attempt("assemble-local", jit_hoisted(assemble_only), A_el)
    if A_loc is None:
        return

    from pnp_tpu.solvers.direct import batched_inv_f32
    inv_x = attempt("inv-xla", jit_hoisted(
        functools.partial(batched_inv_f32, prefer_pallas=False)), A_loc)
    inv_p = attempt("inv-pallas", functools.partial(
        batched_inv_f32, prefer_pallas=True), A_loc)
    print("L4-FACTOR-BISECT-DONE", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)

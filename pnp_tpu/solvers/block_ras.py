"""Single-device overlapping block preconditioner (RAS) for large meshes.

The dense-inverse stage/Poisson fast path (workloads/instationary_pnp_from_pb)
is O(ndof^2) memory and dies above ~8k dofs; the reference handles arbitrary
mesh sizes with SSOR-preconditioned Krylov under a 20,000-iteration budget
(src/instationary_pnp_from_pb_md.hh:188-211, test/pore_pnp/pore.cfg:6).
Sequential SSOR sweeps don't exist on a TPU; the TPU-native equivalent of
that robustness at scale is overlapping-block restricted additive Schwarz
(RAS) with EXACT local solves:

  * dofs are Morton-ordered and split into K contiguous owned blocks of
    ~block_size (spatially compact, so overlap stays thin);
  * each block's local set is its owned dofs plus every dof sharing an
    element with them (one-element-layer overlap);
  * the TRUE principal submatrices A[loc, loc] are assembled from the
    element Jacobian blocks with one batched 2-D scatter and explicitly
    inverted in f32 — batched dense inversion is the MXU's native food,
    and each preconditioner APPLY is then a single batched matvec
    (gather -> (K, L, L) @ (K, L) -> scatter), ~3 fused ops inside the
    Krylov while_loop instead of latency-bound triangular sweeps;
  * optionally a piecewise-constant-per-block Galerkin coarse level
    (the two-level correction that removes the 1/H growth of one-level
    Schwarz on elliptic problems).

RAS (restricted scatter: each dof takes the correction from its OWNER
block only) is the standard nonsymmetric-but-stronger variant — pair it
with BiCGSTAB. Everything here is single-device: the multi-device analogue
lives in solvers/schwarz.py over parallel/dist.py.

Precision: local matrices/inverses are f32 (preconditioner only — Krylov
residuals stay f64). Every f32 matmul uses precision=HIGHEST per the
engine's TPU rule (default bf16 passes degrade contraction quality).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = Any


def morton_order(points: np.ndarray) -> np.ndarray:
    """Z-order permutation of 2-D points (contiguous runs are compact)."""
    pts = np.asarray(points)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    q = np.minimum(((pts - lo) / span * 1024).astype(np.uint32), 1023)
    code = np.zeros(len(pts), dtype=np.uint64)
    for b in range(10):
        code |= ((q[:, 0] >> b) & 1).astype(np.uint64) << np.uint64(2 * b)
        code |= ((q[:, 1] >> b) & 1).astype(np.uint64) << np.uint64(2 * b + 1)
    return np.argsort(code, kind="stable").astype(np.int32)


def _ranges_concat(counts: np.ndarray) -> np.ndarray:
    """[0..c0) ++ [0..c1) ++ ... as one vectorized array."""
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    starts = np.cumsum(counts) - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


@dataclasses.dataclass(frozen=True)
class BlockContext:
    """Static host-built block decomposition of a FunctionSpace.

    K:          number of blocks.
    B:          owned dofs per block (padded; pad entries = ndof).
    L:          local set size (owned + overlap, padded; pad = ndof).
    loc2glob:   (K, L) int32 global dof per local slot (ndof = padding).
    elem_ids:   (K, B_E2) int32 elements touching each block (pad 0).
    elem_dof_local: (K, B_E2, n) int32 local slot of each element dof in
                [0, L]; L is the drop slot (dof outside the block's local
                set, or padded element row).
    owner:      (ndof,) int32 owning block of every dof (coarse-level map).
    ndof:       global dof count.
    """

    K: int
    B: int
    L: int
    loc2glob: Array
    elem_ids: Array
    elem_dof_local: Array
    owner: Array
    ndof: int


def build_block_context(dofmap: np.ndarray, ndof: int,
                        dof_coords: np.ndarray,
                        block_size: int = 256) -> BlockContext:
    """Host-side setup: Morton-ordered owned blocks + 1-element overlap."""
    dofmap = np.asarray(dofmap)
    E, n = dofmap.shape
    perm = morton_order(np.asarray(dof_coords))
    K = max(1, -(-ndof // block_size))
    owner = np.empty(ndof, np.int32)
    # balanced contiguous split of the Morton order
    bounds = np.linspace(0, ndof, K + 1).astype(np.int64)
    for k in range(K):
        owner[perm[bounds[k]:bounds[k + 1]]] = k

    eowner = owner[dofmap]                              # (E, n)
    E_ids = np.arange(E, dtype=np.int64)
    # pass 1 — local dof sets: owned dofs + every dof sharing an element
    # with them (one-element-layer overlap). Vectorized group-by (the r3
    # per-entry python loop was ~5 min at the 1.47M-element level 4):
    # sort (block, element) pairs once, slice per block.
    pk = eowner.ravel().astype(np.int64)
    pe = np.repeat(E_ids, n)
    order = np.argsort(pk, kind="stable")
    pk_s, pe_s = pk[order], pe[order]
    k_starts = np.searchsorted(pk_s, np.arange(K))
    k_ends = np.searchsorted(pk_s, np.arange(K) + 1)

    own_lists = [perm[bounds[k]:bounds[k + 1]] for k in range(K)]
    loc_lists, extra_counts = [], []
    for k in range(K):
        touched = np.unique(dofmap[pe_s[k_starts[k]:k_ends[k]]])
        own_set = own_lists[k]
        extra = np.setdiff1d(touched, own_set, assume_unique=False)
        loc_lists.append(np.concatenate([own_set, extra]))
        extra_counts.append(len(extra))

    # pass 2 — assembly element lists: EVERY element touching any local
    # dof, so the assembled A[loc, loc] is the true principal submatrix
    # (without this, overlap-dof rows are partial "floating Neumann" rows,
    # the local matrices go near-singular, and RAS diverges).
    # Vectorized as a dof->blocks membership join (the r3 K x E x n
    # boolean sweep was O(2.5e10) ops at level 4): memberships from the
    # local sets, CSR over dofs, gathered per element dof, then unique
    # (block, element) pairs grouped per block — same ascending element
    # order as the old np.where.
    mem_d = np.concatenate(loc_lists)
    mem_k = np.repeat(np.arange(K, dtype=np.int64),
                      [len(l) for l in loc_lists])
    d_order = np.argsort(mem_d, kind="stable")
    mem_d_s, mem_k_s = mem_d[d_order], mem_k[d_order]
    d_starts = np.searchsorted(mem_d_s, np.arange(ndof))
    d_ends = np.searchsorted(mem_d_s, np.arange(ndof) + 1)
    d_counts = d_ends - d_starts
    flat_d = dofmap.ravel().astype(np.int64)            # (E*n,)
    cnt = d_counts[flat_d]
    # for each (element-dof occurrence, membership) pair: block id + elem
    gather_ix = (np.repeat(d_starts[flat_d], cnt)
                 + _ranges_concat(cnt))
    pair_k = mem_k_s[gather_ix]
    pair_e = np.repeat(np.repeat(E_ids, n), cnt)
    key = pair_k * np.int64(E) + pair_e
    key = np.unique(key)
    ek, ee = key // E, key % E
    e_starts = np.searchsorted(ek, np.arange(K))
    e_ends = np.searchsorted(ek, np.arange(K) + 1)
    elem_lists = [ee[e_starts[k]:e_ends[k]] for k in range(K)]

    B = max(len(l) for l in own_lists)
    L = max(B + max(extra_counts), 1)
    B_E2 = max(max(len(l) for l in elem_lists), 1)

    loc2glob = np.full((K, L), ndof, np.int64)
    glob2loc = np.full((K, ndof), L, np.int32)
    for k in range(K):
        own, loc = own_lists[k], loc_lists[k]
        # owned dofs occupy slots [0, len(own)); overlap starts at B so the
        # owned region is a fixed [0, B) window for the RAS restriction
        loc2glob[k, :len(own)] = own
        glob2loc[k, own] = np.arange(len(own))
        extra = loc[len(own):]
        loc2glob[k, B:B + len(extra)] = extra
        glob2loc[k, extra] = B + np.arange(len(extra))

    elem_ids = np.zeros((K, B_E2), np.int64)
    elem_dof_local = np.full((K, B_E2, n), L, np.int32)
    for k in range(K):
        l = elem_lists[k]
        elem_ids[k, :len(l)] = l
        elem_dof_local[k, :len(l)] = glob2loc[k, dofmap[l]]

    return BlockContext(
        K=K, B=B, L=L,
        loc2glob=jnp.asarray(loc2glob.astype(np.int32)),
        elem_ids=jnp.asarray(elem_ids.astype(np.int32)),
        elem_dof_local=jnp.asarray(elem_dof_local),
        owner=jnp.asarray(owner),
        ndof=ndof)


def build_block_context_for_space(space, block_size: int = 256) -> BlockContext:
    return build_block_context(np.asarray(space.dofmap), space.ndof,
                               space.dof_coords, block_size)


def _gather_padded(ctx: BlockContext, x: Array) -> Array:
    """x (..., ndof) -> local views (..., K, L); pad slots read 0."""
    x_ext = jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (1,), x.dtype)], axis=-1)
    return x_ext[..., ctx.loc2glob]


def assemble_local_matrices(ctx: BlockContext, A_el: Array, free: Array,
                            rel_shift: float = 0.0) -> Array:
    """Constrained local (subdomain) matrices, (K, L, L)/(S, K, L, L) f32.

    The assembly half of :func:`build_local_inverses`, exposed so huge
    meshes can run assembly and inversion as SEPARATE programs: fused,
    the level-4 pore's (2883, 403, 403) factor program
    RESOURCE_EXHAUSTED at run while each half fits comfortably
    (tools/l4_factor_bisect.log) — XLA's buffer assignment for the
    combined program keeps both halves' peaks alive at once.
    Returns the assembled matrices WITHOUT inverting; compose with
    :func:`invert_local_matrices`, or call :func:`build_local_inverses`
    for the fused (small/mid-mesh) path.
    """
    squeeze = A_el.ndim == 3
    if squeeze:
        A_el, free = A_el[None], free[None]
    S = A_el.shape[0]
    K, L, n = ctx.K, ctx.L, ctx.elem_dof_local.shape[2]
    A32 = A_el.astype(jnp.float32)
    f_loc_t = _gather_padded(ctx, free.astype(jnp.float32)
                             ).swapaxes(0, 1)                # (K, S, L)

    # BLOCK-chunked assembly (VERDICT r3 item 1 family): the per-block
    # element gather (S, K, B_E2, n, n) is a tiny-minor-dim temp whose
    # fused lane-padded copies scale with K*B_E2 — at level-3 scale
    # (K=729) they alone approach HBM. Chunking the block axis bounds
    # them; pad blocks assemble to identity and are sliced off.
    def _assemble(eids, edl, f_c):                # (Kc, ...) per chunk
        Kc = eids.shape[0]
        Ae = jnp.take(A32, eids.reshape(-1), axis=1).reshape(
            S, Kc, -1, n, n)
        s_ix = jnp.arange(S)[:, None, None, None, None]
        k_ix = jnp.arange(Kc)[None, :, None, None, None]
        rows = edl[None, :, :, :, None]
        cols = edl[None, :, :, None, :]
        A = jnp.zeros((S, Kc, L + 1, L + 1), jnp.float32)
        A = A.at[s_ix, k_ix, rows, cols].add(Ae)[:, :, :L, :L]
        fl = f_c.swapaxes(0, 1)                   # (S, Kc, L)
        A = A * fl[:, :, :, None] * fl[:, :, None, :]
        bump = (1.0 - fl)
        if rel_shift:
            diag = jnp.abs(jnp.einsum("skll->skl", A))
            bump = bump + rel_shift * jnp.max(diag, axis=2,
                                              keepdims=True) * fl
        A = A + jax.vmap(jax.vmap(jnp.diag))(bump)
        return A.swapaxes(0, 1)                   # (Kc, S, L, L)

    from ..operators.common import map_element_chunks
    A = map_element_chunks(
        _assemble, (ctx.elem_ids, ctx.elem_dof_local, f_loc_t),
        chunk=256).swapaxes(0, 1)                 # (S, K, L, L)
    return A[0] if squeeze else A


def invert_local_matrices(A: Array) -> Array:
    """Batched f32 inverses of assembled local matrices.

    (K, L, L) or (S, K, L, L) -> same shape. The inversion half of
    :func:`build_local_inverses`; run as its own jitted program at
    level-4 scale (see :func:`assemble_local_matrices`).
    """
    squeeze = A.ndim == 3
    A4 = A[None] if squeeze else A
    S, K, L = A4.shape[0], A4.shape[1], A4.shape[2]
    from .direct import batched_inv_f32
    B = S * K
    A_flat = A4.reshape(B, L, L).astype(jnp.float32)
    # prefer the Pallas GJ at moderate batch counts: the (S*K, L, L)
    # subdomain-matrix shape is where it measured 2.3x faster than XLA
    # getrf+getri (41.8 -> 18.3 ms at (94, 512)), and the contraction
    # probe in batched_inv_f32 falls back to XLA if the elimination
    # degrades on an advective batch. At HUGE batch counts XLA's batched
    # LU wins decisively — (5766, 403, 403) measured Pallas 39.1 s vs
    # XLA 8.2 s (tools/l4_factor_bisect.log) — so cut over above 2048.
    inv = batched_inv_f32(A_flat, prefer_pallas=B <= 2048
                          ).reshape(S, K, L, L)
    return inv[0] if squeeze else inv


import functools


@functools.partial(jax.jit, static_argnums=3)
def _ooc_slice(buf, s, start, size):
    """(size, L, L) chunk at block-row ``start`` (system ``s`` if 4-d)."""
    z = jnp.int32(0)
    if buf.ndim == 3:
        return jax.lax.dynamic_slice(buf, (start, z, z),
                                     (size,) + buf.shape[1:])
    blk = jax.lax.dynamic_slice(buf, (s, start, z, z),
                                (1, size) + buf.shape[2:])
    return blk.reshape((size,) + buf.shape[2:])


@jax.jit
def _ooc_invert(blk):
    from .direct import batched_inv_f32
    return batched_inv_f32(blk, prefer_pallas=False)


@functools.partial(jax.jit, donate_argnums=0)
def _ooc_update(buf, blk, s, start):
    z = jnp.int32(0)
    if buf.ndim == 3:
        return jax.lax.dynamic_update_slice(buf, blk, (start, z, z))
    return jax.lax.dynamic_update_slice(buf, blk[None], (s, start, z, z))


@functools.partial(jax.jit, donate_argnums=0)
def _ooc_set_system(buf, part, s):
    """Write a (K, L, L) system slice into the (S, K, L, L) buffer."""
    z = jnp.int32(0)
    return jax.lax.dynamic_update_slice(buf, part[None], (s, z, z, z))


@functools.partial(jax.jit, static_argnums=1)
def _ooc_pad_identity(blk, size):
    """(rem, L, L) -> (size, L, L): identity blocks beyond rem."""
    rem, L = blk.shape[0], blk.shape[1]
    eye = jnp.broadcast_to(jnp.eye(L, dtype=blk.dtype),
                           (size - rem, L, L))
    return jnp.concatenate([blk, eye], axis=0)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=4)
def _ooc_update_cropped(buf, blk, s, start, rem):
    """Write only the first ``rem`` rows of ``blk`` at ``start``."""
    return _ooc_update(buf, blk[:rem], s, start)


def invert_local_matrices_outofcore(A: Array, chunk: int = None) -> Array:
    """Host-orchestrated in-place chunked inversion for HUGE batches.

    Level-4 pore reality: XLA's whole-batch LU of (5766, 403, 403) wants
    21.7 GB of program temps on a 15.75 GB chip
    (tools/l4_probe_r5b.log); an in-jit fori_loop chunking still
    RESOURCE_EXHAUSTEDs next to the live Poisson factors + element
    tables (tools/l4_probe_r5d.log — the while-loop carry double-buffers
    and the donated input does not alias through the reshape); and even
    an EAGER device reshape of the (2, 2883, 403, 403) batch copies the
    whole buffer (tools/l4_probe_r5e.log). So the chunking moves to the
    HOST and never reshapes the big buffer: three small cached
    programs — slice a (C, L, L) chunk (4-d aware), invert it,
    dynamic_update_slice it back with the buffer DONATED (donated DUS
    aliases reliably, r3 lesson) — keep the peak at one batch buffer +
    one chunk's LU temps. Exact partition per system: full chunks in a
    loop, one static remainder chunk.

    Drop-in for :func:`invert_local_matrices` at the huge-mesh call
    sites; must be called OUTSIDE jit (it dispatches programs).
    """
    import os
    squeeze = A.ndim == 3
    if squeeze:
        S, K, L = 1, A.shape[0], A.shape[1]
    else:
        S, K, L = A.shape[0], A.shape[1], A.shape[2]
    C = chunk or int(os.environ.get("PNP_TPU_INV_CHUNK", "512"))
    C = min(C, K)
    assert A.dtype == jnp.float32, A.dtype
    buf = A
    n_full = K // C
    rem = K - n_full * C
    for s in range(S):
        s32 = jnp.int32(s)
        for i in range(n_full):
            blk = _ooc_invert(_ooc_slice(buf, s32, jnp.int32(i * C), C))
            buf = _ooc_update(buf, blk, s32, jnp.int32(i * C))
        if rem:
            # NEVER invert the raw remainder shape: a (67, 403, 403)
            # batched inversion KERNEL-FAULTS the TPU worker (crash
            # isolated in tools/ooc_isolate_r5.log — full 256-chunks run
            # clean, the odd remainder kills the worker process). Pad to
            # the proven full chunk size with identity blocks (reuses
            # the already-compiled chunk program) and crop on update.
            blk = _ooc_slice(buf, s32, jnp.int32(n_full * C), rem)
            inv_p = _ooc_invert(_ooc_pad_identity(blk, C))
            buf = _ooc_update_cropped(buf, inv_p, s32,
                                      jnp.int32(n_full * C), rem)
    return buf


def build_local_inverses(ctx: BlockContext, A_el: Array, free: Array,
                         rel_shift: float = 0.0) -> Array:
    """Constrained local inverses, (K, L, L)/(S, K, L, L) f32.

    Composes :func:`assemble_local_matrices` + :func:`invert_local_matrices`
    in one program — the right call everywhere the fused peak fits
    (through level 3); huge meshes call the halves separately.
    """
    return invert_local_matrices(
        assemble_local_matrices(ctx, A_el, free, rel_shift))


def make_ras_precond(ctx: BlockContext, inv: Array, free: Array,
                     restricted: bool = True):
    """M(r): gather -> batched MXU matvec -> owner-restricted scatter.

    ``inv``: (K, L, L) or (S, K, L, L) f32 local inverses.
    Accepts flat (ndof,) or batched (S, ndof) residuals (matching inv's
    batching). Identity on constrained dofs. ``restricted=True`` (RAS)
    takes each dof's correction from its owner block only — stronger, but
    nonsymmetric (pair with BiCGSTAB); ``False`` adds every block's
    correction (symmetric additive Schwarz, usable with CG on SPD A).
    """
    own = ctx.loc2glob[:, :ctx.B]                       # (K, B) pad = ndof

    def precond(r: Array) -> Array:
        squeeze = r.ndim == 1
        rb = r[None] if squeeze else r                  # (S, ndof)
        fb = free[None] if free.ndim == 1 else free
        S = rb.shape[0]
        r_loc = _gather_padded(ctx, jnp.where(fb, rb, 0.0))   # (S, K, L)
        iv = inv[None] if inv.ndim == 3 else inv
        iv = jnp.broadcast_to(iv, (S,) + iv.shape[1:])
        z = jnp.einsum("skij,skj->ski", iv, r_loc.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST).astype(rb.dtype)
        if restricted:
            z_own = z[:, :, :ctx.B].reshape(S, -1)      # (S, K*B)
            out = jnp.zeros((S, ctx.ndof), rb.dtype).at[
                :, own.reshape(-1)].add(z_own, mode="drop")
        else:
            out = jnp.zeros((S, ctx.ndof), rb.dtype).at[
                :, ctx.loc2glob.reshape(-1)].add(z.reshape(S, -1),
                                                 mode="drop")
        out = jnp.where(fb, out, rb)
        return out[0] if squeeze else out

    return precond


def build_p1_coarse(ctx: BlockContext, A_el: Array, dofmap: Array,
                    free: Array, dof_coords: np.ndarray, n_modes: int = 3):
    """Piecewise-POLYNOMIAL coarse level: span{1, x, y[, P2...]} per block.

    ``n_modes=3`` (default): constant + both linear modes, in
    block-centered/scaled coordinates for conditioning — triples the
    coarse space of :func:`build_coarse_inverse` and captures the smooth
    error's gradient within each patch; measured to roughly halve
    two-level iteration counts on the constant Poisson operator vs the
    piecewise-constant space. ``n_modes=6`` adds the quadratic modes
    {P2(x), xy, P2(y)} (Legendre P2 = (3t^2-1)/2 on the span-scaled
    coords, near-orthogonal to the constant on quasi-uniform blocks) —
    the r4-roadmap "stronger coarse" candidate for the level-3 Poisson
    where the solve runs ~48 iterations/step. Galerkin coarse matrix
    assembled from element blocks as one 2-D scatter of (E, Mn, Mn)
    weighted blocks.

    Returns ``(coarse_inv (MK, MK) f32, w3 (ndof, M), idx3 (ndof, M))``
    for :func:`make_two_level_precond`'s linear-coarse mode. Only the
    flat (single-system) form is supported — the production user is the
    CONSTANT Poisson operator, factored once at setup.
    """
    assert A_el.ndim == 3, "linear coarse: flat systems only"
    assert n_modes in (3, 6), n_modes
    M = n_modes
    K = ctx.K
    ndof = ctx.ndof
    owner = np.asarray(ctx.owner)
    coords = np.asarray(dof_coords)
    # block-centered, span-scaled coordinates
    cent = np.zeros((K, 2))
    cnt = np.zeros(K)
    np.add.at(cent, owner, coords)
    np.add.at(cnt, owner, 1.0)
    cent /= np.maximum(cnt, 1.0)[:, None]
    span = np.zeros((K, 2))
    np.maximum.at(span, owner, np.abs(coords - cent[owner]))
    span = np.maximum(span, 1e-12)
    xs = (coords - cent[owner]) / span[owner]           # (ndof, 2)
    cols = [np.ones((ndof, 1)), xs]
    if M == 6:
        p2 = 0.5 * (3.0 * xs * xs - 1.0)                # Legendre P2
        cols += [p2[:, :1], (xs[:, :1] * xs[:, 1:]), p2[:, 1:]]
    w3_np = np.concatenate(cols, axis=1)                # (ndof, M)
    free_np = np.asarray(free)
    w3_np = w3_np * free_np[:, None]
    # coarse dof index of (dof, mode); constrained dofs -> drop row MK
    idx3_np = np.where(free_np[:, None], owner[:, None] * M + np.arange(M),
                       M * K)

    dofmap_np = np.asarray(dofmap)
    w_el = jnp.asarray(w3_np)[dofmap_np].astype(jnp.float32)   # (E, n, M)
    ei = jnp.asarray(idx3_np)[dofmap_np]                       # (E, n, M)
    E, n = dofmap_np.shape

    # element-chunked Galerkin assembly (VERDICT r3 item 1 family): the
    # (E, n, M, n, M) einsum product is tiny-minor-dim and its fused
    # scatter remat-copies lane-pad ~100x — at the 367k-element level-3
    # mesh that alone OOMs HBM at compile; chunking bounds the temps.
    # Pad elements: zero A/w values scatter zeros at index 0 — harmless.
    from ..operators.common import map_element_chunk_sum

    def _chunk(A_c, w_c, e_c):
        Aw = jnp.einsum("eij,eia,ejb->eiajb", A_c.astype(jnp.float32),
                        w_c, w_c, precision=jax.lax.Precision.HIGHEST)
        rows = e_c.reshape(e_c.shape[0], n * M)
        return jnp.zeros((M * K + 1, M * K + 1), jnp.float32).at[
            rows[:, :, None], rows[:, None, :]].add(
                Aw.reshape(e_c.shape[0], n * M, n * M))

    Ac = map_element_chunk_sum(_chunk, (A_el, w_el, ei))[:M * K, :M * K]
    # regularize: empty/degenerate modes (e.g. all-Dirichlet blocks, or
    # blocks whose free dofs are collinear) -> identity-ish rows
    d = jnp.diagonal(Ac)
    scale = jnp.max(jnp.abs(d)) + 1.0
    Ac = Ac + jnp.diag(jnp.where(jnp.abs(d) > 1e-9 * scale,
                                 1e-6 * jnp.abs(d), 1.0))
    with jax.default_matmul_precision("highest"):
        cinv = jnp.linalg.inv(Ac)
    return cinv, jnp.asarray(w3_np), jnp.asarray(idx3_np)


def build_p1_coarse_batched(ctx: BlockContext, A_el: Array, dofmap: Array,
                            free: Array, dof_coords: np.ndarray):
    """Batched piecewise-linear coarse level for the (S, E, n, n) species
    stage systems (VERDICT r2 item 2: the two-level correction existed
    only for the constant Poisson; one-level RAS iteration counts grow
    ~1/H on the large advective stage systems too — BiCGSTAB tolerates
    the nonsymmetric coarse correction).

    ``free``: (S, ndof) per-system masks (c+ and c- may constrain
    different surfaces). Geometry (block centers/spans) is shared; the
    mask-dependent weights/indices are per system. Returns
    ``(coarse_inv (S, 3K, 3K) f32, w3 (S, ndof, 3), idx3 (S, ndof, 3))``
    for :func:`make_p1_coarse_correction` (which broadcasts over S).
    """
    assert A_el.ndim == 4, "batched coarse: (S, E, n, n) element blocks"
    S = A_el.shape[0]
    K, ndof = ctx.K, ctx.ndof
    owner = np.asarray(ctx.owner)
    coords = np.asarray(dof_coords)
    cent = np.zeros((K, 2))
    cnt = np.zeros(K)
    np.add.at(cent, owner, coords)
    np.add.at(cnt, owner, 1.0)
    cent /= np.maximum(cnt, 1.0)[:, None]
    span = np.zeros((K, 2))
    np.maximum.at(span, owner, np.abs(coords - cent[owner]))
    span = np.maximum(span, 1e-12)
    xs = (coords - cent[owner]) / span[owner]
    base3 = np.concatenate([np.ones((ndof, 1)), xs], axis=1)   # (ndof, 3)
    free_np = np.asarray(free)                                  # (S, ndof)
    w3_np = base3[None] * free_np[:, :, None]                   # (S, ndof, 3)
    idx3_np = np.where(free_np[:, :, None],
                       owner[None, :, None] * 3 + np.arange(3)[None, None],
                       3 * K)

    dofmap_np = np.asarray(dofmap)
    E, n = dofmap_np.shape
    w_el = jnp.asarray(w3_np)[:, dofmap_np].astype(jnp.float32)  # (S,E,n,3)
    ei = jnp.asarray(idx3_np)[:, dofmap_np]                      # (S,E,n,3)

    # element-chunked Galerkin assembly, element axis moved in front for
    # the chunker (same lane-padding bound as build_p1_coarse; ALSO the
    # r3 "species_two_level faults the device at 46k" suspect — the
    # batched 6-axis einsum + 4-D scatter was the one program the
    # non-batched production sibling never ran at that size)
    from ..operators.common import map_element_chunk_sum

    def _chunk(A_c, w_c, e_c):                    # (Ec, S, ...) operands
        Aw = jnp.einsum("esij,esia,esjb->esiajb", A_c.astype(jnp.float32),
                        w_c, w_c, precision=jax.lax.Precision.HIGHEST)
        Ec = e_c.shape[0]
        rows = e_c.reshape(Ec, S, n * 3)
        s_ix = jnp.arange(S)[None, :, None, None]
        return jnp.zeros((S, 3 * K + 1, 3 * K + 1), jnp.float32).at[
            s_ix, rows[:, :, :, None], rows[:, :, None, :]].add(
                Aw.reshape(Ec, S, n * 3, n * 3))

    Ac = map_element_chunk_sum(
        _chunk, (A_el.swapaxes(0, 1), w_el.swapaxes(0, 1),
                 ei.swapaxes(0, 1)))[:, :3 * K, :3 * K]
    d = jnp.diagonal(Ac, axis1=1, axis2=2)
    scale = jnp.max(jnp.abs(d), axis=1, keepdims=True) + 1.0
    Ac = Ac + jax.vmap(jnp.diag)(jnp.where(jnp.abs(d) > 1e-9 * scale,
                                           1e-6 * jnp.abs(d), 1.0))
    with jax.default_matmul_precision("highest"):
        cinv = jnp.linalg.inv(Ac)
    return cinv, jnp.asarray(w3_np), jnp.asarray(idx3_np)


def make_p1_coarse_correction(ctx: BlockContext, p1_coarse, free: Array):
    """r -> P Ac^-1 R r for the piecewise-linear coarse level.

    Accepts the flat tables of :func:`build_p1_coarse` (shared across a
    batch) or the per-system tables of :func:`build_p1_coarse_batched`
    (cinv (S, 3K, 3K), w3/idx3 (S, ndof, 3)).

    GATHER formulation (r4): the r3 apply scattered (ndof, 3) mode
    contributions through idx3 — at 185k dofs the lane-3-padded
    scatter/gather fusions cost 68.8 ms per apply (2x per Krylov
    iteration, the dominant piece of the L3 two-level cost,
    tools/results_tpu_l3_profile_r4.log). The owner blocks are exactly
    the [0, B) owned slots of ``ctx.loc2glob``, so restriction is a
    fixed-shape gather + einsum over (K, B) owned values and
    prolongation one unique-index set — no variable scatter at all.
    Dtype follows the residual (an f64 table must not promote the f32
    inner-Krylov path's vectors — the bug the L3 profile crashed on).
    """
    cinv, w3, idx3 = p1_coarse
    K3 = cinv.shape[-1]
    K = ctx.K
    M = w3.shape[-1]                                    # modes per block
    batched_tables = w3.ndim == 3
    own = ctx.loc2glob[:, :ctx.B]                       # (K, B), pad = ndof
    # per-owned-slot mode weights, (S?, K, B, M); pad slots read 0
    w_ext = jnp.concatenate(
        [w3, jnp.zeros(w3.shape[:-2] + (1, M), w3.dtype)], axis=-2)
    w_own = w_ext[..., own, :]                          # (S?, K, B, M)

    def coarse(r: Array) -> Array:
        rb = r[None] if r.ndim == 1 else r
        S = rb.shape[0]
        if batched_tables:
            # a flat residual against per-system tables would silently
            # broadcast and return only system 0's correction (ADVICE r3)
            assert rb.shape[0] == w3.shape[0], (
                "batched p1-coarse tables need a matching (S, ndof) "
                f"residual batch: got {rb.shape[0]} vs S={w3.shape[0]}")
        wo = (w_own if batched_tables else w_own[None]).astype(rb.dtype)
        rb_ext = jnp.concatenate(
            [rb, jnp.zeros((S, 1), rb.dtype)], axis=1)
        r_own = rb_ext[:, own]                          # (S, K, B)
        rc = jnp.einsum("skb,skbm->skm", r_own, jnp.broadcast_to(
            wo, (S, K, ctx.B, M))).reshape(S, K3)
        ci = cinv if cinv.ndim == 3 else cinv[None]
        zc = jnp.einsum("skj,sj->sk",
                        jnp.broadcast_to(ci, (S, K3, K3)).astype(rb.dtype),
                        rc, precision=jax.lax.Precision.HIGHEST)
        z_own = jnp.einsum("skm,skbm->skb", zc.reshape(S, K, M),
                           jnp.broadcast_to(wo, (S, K, ctx.B, M)))
        # owned slots partition the dofs -> unique-index set (pad drops)
        z = jnp.zeros((S, ctx.ndof), rb.dtype).at[
            :, own.reshape(-1)].set(z_own.reshape(S, -1), mode="drop")
        z = jnp.where(free, z, 0.0)
        return z[0] if r.ndim == 1 else z

    return coarse


def build_coarse_inverse(ctx: BlockContext, A_el: Array, dofmap: Array,
                         free: Array) -> Array:
    """f32 inverse of the piecewise-constant Galerkin coarse matrix.

    Coarse space: one constant per block over its owned FREE dofs; the
    coarse matrix is assembled directly from element blocks by owner id
    (constrained dofs dumped into a drop row). Returns (K, K) or (S, K, K).
    """
    squeeze = A_el.ndim == 3
    if squeeze:
        A_el, free = A_el[None], free[None]
    S = A_el.shape[0]
    K = ctx.K
    o = jnp.where(free, ctx.owner[None, :], K)          # (S, ndof)
    eo = o[:, dofmap]                                    # (S, E, n)
    s_ix = jnp.arange(S)[:, None, None, None]
    Ac = jnp.zeros((S, K + 1, K + 1), jnp.float32)
    Ac = Ac.at[s_ix, eo[:, :, :, None], eo[:, :, None, :]].add(
        A_el.astype(jnp.float32))[:, :K, :K]
    # empty blocks (all-Dirichlet) -> identity
    d = jnp.einsum("skk->sk", Ac)
    Ac = Ac + jax.vmap(jnp.diag)(jnp.where(jnp.abs(d) > 0.0, 0.0, 1.0)
                                 + 1e-6 * jnp.abs(d))
    with jax.default_matmul_precision("highest"):
        inv = jnp.linalg.inv(Ac)
    return inv[0] if squeeze else inv


def make_two_level_precond(ctx: BlockContext, inv: Array, coarse_inv: Array,
                           op, free: Array, p1_coarse=None):
    """Multiplicative RAS + coarse correction.

    z1 = RAS(r); z = z1 + P Ac^-1 R (r - A z1). One extra operator apply
    per call; removes the one-level 1/H iteration growth on elliptic
    operators. Nonsymmetric — pair with BiCGSTAB. ``p1_coarse`` (from
    :func:`build_p1_coarse`) switches the coarse space from piecewise
    constant to piecewise linear (coarse_inv is then ignored).
    """
    ras = make_ras_precond(ctx, inv, free)
    if p1_coarse is not None:
        coarse_l = make_p1_coarse_correction(ctx, p1_coarse, free)

        def precond_l(r: Array) -> Array:
            z1 = ras(r)
            resid = r - op(z1)
            resid = jnp.where(free, resid, 0.0)
            return z1 + coarse_l(resid)

        return precond_l
    K = ctx.K

    def coarse(r: Array) -> Array:
        rb = r[None] if r.ndim == 1 else r
        S = rb.shape[0]
        o = jnp.where(free, ctx.owner, K)
        ob = jnp.broadcast_to(o if o.ndim == 2 else o[None], rb.shape)
        rc = jnp.zeros((S, K + 1), rb.dtype).at[
            jnp.arange(S)[:, None], ob].add(rb)[:, :K]
        ci = coarse_inv if coarse_inv.ndim == 3 else coarse_inv[None]
        zc = jnp.einsum("skj,sj->sk", ci.astype(rb.dtype), rc,
                        precision=jax.lax.Precision.HIGHEST)
        zc_ext = jnp.concatenate([zc, jnp.zeros((S, 1), rb.dtype)], axis=1)
        z = jnp.take_along_axis(zc_ext, ob, axis=1)
        z = jnp.where(free, z, 0.0)
        return z[0] if r.ndim == 1 else z

    def precond(r: Array) -> Array:
        z1 = ras(r)
        resid = r - op(z1)
        resid = jnp.where(free, resid, 0.0)
        return z1 + coarse(resid)

    return precond

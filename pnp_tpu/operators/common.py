"""Shared helpers for batched weak-form kernels."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..fem.geometry import VolumeTables, BoundaryTables

# Element-axis chunk size for the assembly kernels. On TPU, XLA lowers the
# f64 "eq,eqid,eqjd->eij" element contractions to multi-pass bf16 matmuls
# whose remat temp copies take LANE-PADDED layouts (minor dims n=3 / d=2 on
# a (4, 128)-tiled layout -> 42-57x expansion, observed as a compile-time
# HBM OOM at the 367,616-element level-3 pore: VERDICT r3 item 1 /
# tools/results_tpu_l3 logs). Stored arrays are fine (XLA picks E-minor
# layouts for program inputs/outputs); only fused-program TEMPS explode.
# Chunking the element axis through lax.map bounds every temp to the chunk
# size while compiling ONE body. Value-identical at any chunk (elements
# are independent; per-element contraction order unchanged).
_ELEM_CHUNK = int(os.environ.get("PNP_TPU_ELEM_CHUNK", "65536"))


def elem_chunk() -> int:
    return _ELEM_CHUNK


def map_element_chunks(body, elem_args, chunk: int | None = None):
    """Run ``body(*elem_args)`` in chunks over the shared leading E axis.

    ``elem_args``: arrays with identical leading element dimension E;
    ``body`` returns a pytree of arrays with leading dimension E (chunked
    calls see the chunk size instead). For E <= chunk this is a direct
    call — the flagship and mid-size meshes compile byte-identical
    programs; only level-3-scale assemblies take the lax.map path.
    Pad elements feed zero tables through the body (outputs are sliced
    off before returning, so any garbage they produce is dropped).
    """
    ch = _ELEM_CHUNK if chunk is None else chunk
    E = elem_args[0].shape[0]
    if ch <= 0 or E <= ch:
        return body(*elem_args)
    C = -(-E // ch)
    Ep = C * ch

    def prep(a):
        a = jnp.pad(a, ((0, Ep - E),) + ((0, 0),) * (a.ndim - 1))
        return a.reshape((C, ch) + a.shape[1:])

    out = jax.lax.map(lambda xs: body(*xs), tuple(prep(a) for a in elem_args))
    return jax.tree_util.tree_map(
        lambda o: o.reshape((C * ch,) + o.shape[2:])[:E], out)


def map_element_chunk_sum(body, elem_args, chunk: int | None = None):
    """Chunked REDUCTION over the element axis: ``body(*chunks)`` returns
    a pytree of arrays WITHOUT the element axis (partial sums — e.g. a
    scattered coarse/global matrix); chunk results are summed. Pad
    elements must contribute zero through the body (zero tables/values —
    int index args pad to 0, so their values must be zero-padded too).
    Bounds the lane-padded temps of element-einsum + scatter fusions the
    same way :func:`map_element_chunks` does for per-element outputs.
    """
    ch = _ELEM_CHUNK if chunk is None else chunk
    E = elem_args[0].shape[0]
    if ch <= 0 or E <= ch:
        return body(*elem_args)
    C = -(-E // ch)
    Ep = C * ch

    def prep(a):
        a = jnp.pad(a, ((0, Ep - E),) + ((0, 0),) * (a.ndim - 1))
        return a.reshape((C, ch) + a.shape[1:])

    out = jax.lax.map(lambda xs: body(*xs), tuple(prep(a) for a in elem_args))
    return jax.tree_util.tree_map(lambda o: o.sum(axis=0), out)


def map_table_chunks(kernel, t: VolumeTables, fields=(), chunk: int | None = None):
    """Chunked-run an element kernel over a :class:`VolumeTables`.

    ``kernel(t_chunk, *field_chunks)`` sees tables whose element-axis
    arrays (gradphi, qw, qy) are chunk slices; ``fields`` are additional
    (E, ...) arrays (element dof values, interpolated gradients). The
    shared ``shape`` table passes through; ``dofmap`` is NOT sliced (the
    volume kernels never read it).
    """
    import dataclasses

    def body(gp, qw, qy, *fs):
        tc = dataclasses.replace(t, gradphi=gp, qw=qw, qy=qy)
        return kernel(tc, *fs)

    return map_element_chunks(body, (t.gradphi, t.qw, t.qy) + tuple(fields),
                              chunk)


def qfactor(t: VolumeTables, cylindrical: bool, pi: float):
    """Quadrature factor w*|detJ| with optional axisymmetric 2*pi*y weight.

    Parity: the reference multiplies by ``globalpos[1]*2*PI`` when
    ``cylindrical`` (src/pb_operator.hh:85-86). Note the reference applies
    this in PB/Poisson/PNP operators but NOT in the species drift-diffusion
    and scalar mass operators (src/diffusion_operator.hh:100,
    src/diffusion_toperator.hh:69) — callers wire the flag per operator.
    """
    f = t.qw
    if cylindrical:
        f = f * t.qy * (2.0 * pi)
    return f


def bqfactor(t: BoundaryTables, cylindrical: bool, pi: float):
    f = t.qw
    if cylindrical:
        f = f * t.qy * (2.0 * pi)
    return f


def interp(ue, shape):
    """Element dof values (E, n) x shape table (nq, n) -> u at quad (E, nq)."""
    return jnp.einsum("ei,qi->eq", ue, shape)


def interp_grad(ue, gradphi):
    """(E, n) x (E, nq, n, 2) -> grad u at quad points (E, nq, 2)."""
    return jnp.einsum("ei,eqid->eqd", ue, gradphi)

"""Owner-partitioned distributed SpMV with packed halo exchange.

The v1 scheme (parallel/sharding.py) replicates dof vectors and psums full
vectors — correct, but all-reduce traffic scales with the GLOBAL dof count.
This module is the v2 scheme, the true analogue of DUNE-ISTL's NOVLP
point-to-point halo exchange (SURVEY.md section 2.3), re-expressed as XLA
ring collectives so the traffic rides ICI:

  * dofs are partitioned by OWNER shard (owner = first partition-order
    element shard touching the dof) and renumbered so each shard's owned
    dofs are a contiguous padded block — vectors live sharded (K, B_N);
  * each shard's elements reference [owned | halo] local indices; halo
    values move as PACKED per-pair buffers (only what a destination
    actually needs, padded to the max pair width H) — exchange traffic
    K^2 H instead of the v1 scheme's K N full-vector all-reduce;
  * SpMV contributions landing on halo rows are returned to their owners
    by the transposed exchange (same index plan, reversed direction) —
    the "additive vector" convention;
  * Krylov dot products reduce across shards via the partitioner.

Collectives are GSPMD-inserted (sharding constraints on K-leading arrays
under jit) — see make_sharded_spmv for why manual shard_map collectives
are avoided in this environment. Correctness is pinned against the dense
operator on 8 virtual CPU devices (tests/test_halo.py); wiring it through
the production driver is the round-2 scaling task (CLAUDE.md roadmap).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = Any


@dataclasses.dataclass
class HaloPlan:
    """Static distribution plan (host-built numpy; device arrays on use).

    K:        number of shards.
    B_E:      padded elements per shard.
    B_N:      padded owned dofs per shard.
    B_H:      padded halo dofs per shard.
    H_pair:   padded per-pair exchange width.
    dofmap_local: (K, B_E, n) int32 — element dofs as local indices into
              the [owned (B_N) | halo (B_H)] local vector (padded elements
              point at a zero-weight scratch row, index 0).
    elem_ids: (K, B_E) int32 global element ids (-1 = padding).
    send_idx: (K, K, H_pair) — send_idx[s, t]: positions in s's owned
              block that shard t needs (pad: 0).
    recv_pos: (K, K, H_pair) — recv_pos[t, s]: positions in t's halo block
              for values arriving from s (pad: B_H, dropped on scatter).
    owned_global: (K, B_N) int64 global dof of each owned slot (-1 pad).
    owner_of: (ndof,) owner shard per global dof.
    ndof:     global dof count.
    """

    K: int
    B_E: int
    B_N: int
    B_H: int
    H_pair: int
    dofmap_local: np.ndarray
    elem_ids: np.ndarray
    send_idx: np.ndarray
    recv_pos: np.ndarray
    owned_global: np.ndarray
    owner_of: np.ndarray
    ndof: int


def build_halo_plan(dofmap: np.ndarray, ndof: int, K: int,
                    element_perm: np.ndarray | None = None) -> HaloPlan:
    dofmap = np.asarray(dofmap)
    E, n = dofmap.shape
    perm = (np.asarray(element_perm) if element_perm is not None
            else np.arange(E))
    B_E = -(-E // K)
    shard_elems = []
    for s in range(K):
        ids = perm[s * B_E:(s + 1) * B_E]
        pad = np.full(B_E - ids.size, -1, dtype=ids.dtype)
        shard_elems.append(np.concatenate([ids, pad]))
    elem_ids = np.stack(shard_elems)                     # (K, B_E)

    owner = np.full(ndof, -1, dtype=np.int32)
    for s in range(K):
        ids = elem_ids[s][elem_ids[s] >= 0]
        dofs = np.unique(dofmap[ids])
        fresh = dofs[owner[dofs] < 0]
        owner[fresh] = s
    owner[owner < 0] = 0                                 # untouched dofs

    owned = [np.where(owner == s)[0] for s in range(K)]
    B_N = max(max(len(o) for o in owned), 1)
    owned_global = np.full((K, B_N), -1, dtype=np.int64)
    pos_of = np.zeros(ndof, dtype=np.int64)              # slot within owner
    for s in range(K):
        owned_global[s, :len(owned[s])] = owned[s]
        pos_of[owned[s]] = np.arange(len(owned[s]))

    halos = []
    for s in range(K):
        ids = elem_ids[s][elem_ids[s] >= 0]
        dofs = np.unique(dofmap[ids])
        h = dofs[owner[dofs] != s]
        # deterministic order: by (owner, slot)
        h = h[np.lexsort((pos_of[h], owner[h]))]
        halos.append(h)
    B_H = max(max(len(h) for h in halos), 1)

    H_pair = 1
    send_lists = [[None] * K for _ in range(K)]
    recv_lists = [[None] * K for _ in range(K)]
    for t in range(K):
        for s in range(K):
            if s == t:
                continue
            sel = np.where(owner[halos[t]] == s)[0]      # halo slots in t
            send_lists[s][t] = pos_of[halos[t][sel]]     # slots in s owned
            recv_lists[t][s] = sel
            H_pair = max(H_pair, sel.size)
    send_idx = np.zeros((K, K, H_pair), dtype=np.int32)
    recv_pos = np.full((K, K, H_pair), B_H, dtype=np.int32)  # pad -> drop
    for s in range(K):
        for t in range(K):
            if s == t or send_lists[s][t] is None:
                continue
            m = send_lists[s][t].size
            send_idx[s, t, :m] = send_lists[s][t]
            recv_pos[t, s, :m] = recv_lists[t][s]

    # local dofmaps
    halo_slot = {}
    for s in range(K):
        for k, d in enumerate(halos[s]):
            halo_slot[(s, d)] = B_N + k
    dofmap_local = np.zeros((K, B_E, n), dtype=np.int32)
    for s in range(K):
        for e_loc, e in enumerate(elem_ids[s]):
            if e < 0:
                continue
            for k, d in enumerate(dofmap[e]):
                if owner[d] == s:
                    dofmap_local[s, e_loc, k] = pos_of[d]
                else:
                    dofmap_local[s, e_loc, k] = halo_slot[(s, d)]

    return HaloPlan(K=K, B_E=B_E, B_N=B_N, B_H=B_H, H_pair=H_pair,
                    dofmap_local=dofmap_local, elem_ids=elem_ids,
                    send_idx=send_idx, recv_pos=recv_pos,
                    owned_global=owned_global, owner_of=owner, ndof=ndof)


def partition_vector(plan: HaloPlan, x: np.ndarray) -> np.ndarray:
    """Global (ndof,) -> owner-partitioned (K, B_N) (padded slots 0)."""
    out = np.zeros((plan.K, plan.B_N), dtype=np.asarray(x).dtype)
    mask = plan.owned_global >= 0
    out[mask] = np.asarray(x)[plan.owned_global[mask]]
    return out


def unpartition_vector(plan: HaloPlan, xs: np.ndarray) -> np.ndarray:
    """Owner-partitioned (K, B_N) -> global (ndof,)."""
    xs = np.asarray(xs)
    out = np.zeros(plan.ndof, dtype=xs.dtype)
    mask = plan.owned_global >= 0
    out[plan.owned_global[mask]] = xs[mask]
    return out


def partition_element_array(plan: HaloPlan, arr: np.ndarray) -> np.ndarray:
    """Element array (E, ...) -> (K, B_E, ...) per the plan (pad rows 0)."""
    arr = np.asarray(arr)
    out = np.zeros((plan.K, plan.B_E) + arr.shape[1:], dtype=arr.dtype)
    for s in range(plan.K):
        ids = plan.elem_ids[s]
        sel = ids >= 0
        out[s, sel] = arr[ids[sel]]
    return out


def make_sharded_spmv(plan: HaloPlan, mesh: Mesh, A_el_sharded: Array,
                      dofmap_local: Array, send_idx: Array, recv_pos: Array):
    """Return spmv(x_parts (K, B_N) sharded) -> y_parts, and dot(a, b).

    All device arrays must be placed with P('e') on axis 0.

    Collective strategy: the exchange is written as GSPMD-friendly global
    ops — pack per-destination buffers (K_src, K_dst, H), transpose the
    shard axis, scatter locally — with ``with_sharding_constraint`` pinning
    every K-leading array to P('e'). XLA's partitioner inserts the
    all-to-all for the transposed buffer (traffic K^2 H << the K*N
    full-vector psum of the v1 replicated scheme whenever halos are thin).
    Manual ``shard_map`` collectives are NOT used: this jax build
    mis-lowers ppermute/all_to_all/all_gather inside shard_map (valid
    permutations rejected or identity results — see CLAUDE.md); only
    partitioner-inserted collectives are trustworthy here.
    """
    K, B_N, B_H, H = plan.K, plan.B_N, plan.B_H, plan.H_pair
    esh = NamedSharding(mesh, P("e"))
    pin = lambda a: jax.lax.with_sharding_constraint(a, esh)
    karange = jnp.arange(K)

    def _forward_halo(x_parts):
        """(K, B_N) -> (K, B_H) halo values fetched from owners."""
        src = jnp.broadcast_to(x_parts[:, None, :], (K, K, B_N))
        buf = jnp.take_along_axis(src, send_idx, axis=2)       # (Ksrc,Kdst,H)
        buf_t = pin(jnp.swapaxes(buf, 0, 1))                   # (Kdst,Ksrc,H)
        halo = jnp.zeros((K, B_H + 1), dtype=x_parts.dtype)    # +1 drop slot
        halo = halo.at[karange[:, None, None], recv_pos].set(
            buf_t, mode="drop")
        return halo[:, :B_H]

    def _backward_return(y_halo):
        """(K, B_H) halo contributions -> (K, B_N) additive owner updates."""
        yh = jnp.concatenate(
            [y_halo, jnp.zeros((K, 1), y_halo.dtype)], axis=1)  # drop slot
        src = jnp.broadcast_to(yh[:, None, :], (K, K, B_H + 1))
        buf = jnp.take_along_axis(src, jnp.minimum(recv_pos, B_H), axis=2)
        buf = jnp.where(recv_pos < B_H, buf, 0.0)              # (Ksender,Kown,H)
        buf_t = pin(jnp.swapaxes(buf, 0, 1))                   # (Kown,Ksender,H)
        acc = jnp.zeros((K, B_N), dtype=y_halo.dtype)
        acc = acc.at[karange[:, None, None], send_idx].add(buf_t)
        return acc

    @jax.jit
    def spmv(x_parts):
        x_parts = pin(x_parts)
        halo = _forward_halo(x_parts)
        xloc = pin(jnp.concatenate([x_parts, halo], axis=1))   # (K, B_N+B_H)
        xe = jnp.take_along_axis(
            xloc, dofmap_local.reshape(K, -1), axis=1).reshape(
            K, plan.B_E, -1)
        ye = jnp.einsum("keij,kej->kei", A_el_sharded, xe)
        yloc = jnp.zeros((K, B_N + B_H), dtype=x_parts.dtype).at[
            karange[:, None], dofmap_local.reshape(K, -1)].add(
            ye.reshape(K, -1))
        yloc = pin(yloc)
        return yloc[:, :B_N] + _backward_return(yloc[:, B_N:])

    @jax.jit
    def dot(a, b):
        return jnp.vdot(a, b)   # partitioner reduces across shards

    return spmv, dot


def device_put_plan(plan: HaloPlan, mesh: Mesh, A_el: np.ndarray):
    """Place the plan's arrays: axis 0 sharded over 'e'."""
    esh = NamedSharding(mesh, P("e"))
    put = lambda a: jax.device_put(jnp.asarray(a), esh)
    return (put(partition_element_array(plan, np.asarray(A_el))),
            put(plan.dofmap_local), put(plan.send_idx), put(plan.recv_pos))


def make_sharded_assembler(plan: HaloPlan, mesh: Mesh, dofmap_local: Array,
                           send_idx: Array, recv_pos: Array):
    """Generalized owner-partitioned assembly: residuals of arbitrary
    element kernels, not just SpMV.

    Returns ``assemble(x_parts, element_kernel)`` where ``element_kernel``
    maps gathered element dof values (K, B_E, n) -> per-element residuals
    (K, B_E, n) (closing over sharded element tables), and the result is
    the owner-partitioned assembled residual (K, B_N) with halo
    contributions returned to their owners. This is the distributed form
    of fem.assembly.scatter_add for the nonlinear operators (PB residual,
    drift-diffusion reassembly, ...).
    """
    K, B_N, B_H = plan.K, plan.B_N, plan.B_H
    esh = NamedSharding(mesh, P("e"))
    pin = lambda a: jax.lax.with_sharding_constraint(a, esh)
    karange = jnp.arange(K)

    def _forward_halo(x_parts):
        src = jnp.broadcast_to(x_parts[:, None, :], (K, K, B_N))
        buf = jnp.take_along_axis(src, send_idx, axis=2)
        buf_t = pin(jnp.swapaxes(buf, 0, 1))
        halo = jnp.zeros((K, B_H + 1), dtype=x_parts.dtype)
        halo = halo.at[karange[:, None, None], recv_pos].set(buf_t,
                                                             mode="drop")
        return halo[:, :B_H]

    def _backward_return(y_halo):
        yh = jnp.concatenate(
            [y_halo, jnp.zeros((K, 1), y_halo.dtype)], axis=1)
        src = jnp.broadcast_to(yh[:, None, :], (K, K, B_H + 1))
        buf = jnp.take_along_axis(src, jnp.minimum(recv_pos, B_H), axis=2)
        buf = jnp.where(recv_pos < B_H, buf, 0.0)
        buf_t = pin(jnp.swapaxes(buf, 0, 1))
        acc = jnp.zeros((K, B_N), dtype=y_halo.dtype)
        acc = acc.at[karange[:, None, None], send_idx].add(buf_t)
        return acc

    def assemble(x_parts, element_kernel):
        x_parts = pin(x_parts)
        halo = _forward_halo(x_parts)
        xloc = pin(jnp.concatenate([x_parts, halo], axis=1))
        xe = jnp.take_along_axis(
            xloc, dofmap_local.reshape(K, -1), axis=1).reshape(
            K, plan.B_E, -1)
        re = element_kernel(xe)                       # (K, B_E, n)
        yloc = jnp.zeros((K, B_N + B_H), dtype=x_parts.dtype).at[
            karange[:, None], dofmap_local.reshape(K, -1)].add(
            re.reshape(K, -1))
        yloc = pin(yloc)
        return yloc[:, :B_N] + _backward_return(yloc[:, B_N:])

    return assemble

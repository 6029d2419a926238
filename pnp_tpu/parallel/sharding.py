"""Multi-device distribution: elements sharded over a jax device mesh.

TPU-native replacement for the reference's MPI domain decomposition
(rank-0 Gmsh read + broadcast + UG loadBalance + NOVLP ghost exchange,
src/pnp_solver_main.cc:86-114). Instead of per-rank subgrids with ghost
entities, mesh-element tables (dof maps, geometry, element matrices) are
sharded over a 1-D ``jax.sharding.Mesh`` axis ``'e'`` while dof vectors stay
replicated ("additive vector, consistent matrix" in DUNE's NOVLP language):

  * assembly / SpMV: each device gathers from its replicated vector copy,
    evaluates its element block batch, scatter-adds locally, and the
    partial dof vectors are summed by the all-reduce XLA inserts (psum
    over ICI) — the exact collective the NOVLP Krylov halo exchange +
    reduction pair performs, minus the irregular point-to-point traffic.
  * Krylov dot products are local on replicated vectors (already summed).

Elements are padded to a multiple of the device count with zero-weight
(qw = 0) dummy elements mapping to dof 0, so every shard is statically
shaped and padded contributions vanish identically.

GSPMD does the partitioning: jitted steps consume tables placed with these
shardings and XLA inserts the collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fem.geometry import VolumeTables

Array = Any


def make_device_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devices), axis_names=("e",))


def replicate(mesh: Mesh, x: Array) -> Array:
    return jax.device_put(x, NamedSharding(mesh, P()))


def _pad_amount(E: int, n: int) -> int:
    return (-E) % n


def pad_elements(arr: np.ndarray, E_pad: int, fill=0):
    """Pad axis 0 (elements) to E_pad with ``fill``."""
    E = arr.shape[0]
    if E == E_pad:
        return arr
    pad_width = [(0, E_pad - E)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(np.asarray(arr), pad_width, constant_values=fill)


def shard_volume_tables(vt: VolumeTables, mesh: Mesh) -> VolumeTables:
    """Pad + place volume tables: element axis sharded, shape table replicated.

    Padding uses qw = 0 so padded elements contribute exactly zero to any
    residual/Jacobian, and dofmap = 0 so their scatters are in-bounds.
    """
    n = mesh.devices.size
    E = vt.dofmap.shape[0]
    E_pad = E + _pad_amount(E, n)
    esh = NamedSharding(mesh, P("e"))
    rsh = NamedSharding(mesh, P())
    return VolumeTables(
        shape=jax.device_put(vt.shape, rsh),
        gradphi=jax.device_put(jnp.asarray(
            pad_elements(np.asarray(vt.gradphi), E_pad)), esh),
        qw=jax.device_put(jnp.asarray(
            pad_elements(np.asarray(vt.qw), E_pad)), esh),
        qy=jax.device_put(jnp.asarray(
            pad_elements(np.asarray(vt.qy), E_pad)), esh),
        dofmap=jax.device_put(jnp.asarray(
            pad_elements(np.asarray(vt.dofmap), E_pad)), esh),
    )

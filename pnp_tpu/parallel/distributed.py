"""Multi-host runtime bring-up.

TPU-native replacement for the reference's MPI bootstrap
(``Dune::MPIHelper::instance`` at src/dune_pnp.cc:13 and the rank-0 mesh
broadcast at src/pnp_solver_main.cc:86-100): each host calls
``initialize_distributed()`` (jax.distributed), reads the mesh itself
(deterministic parse replaces the broadcast), and builds the global device
mesh. Element tables are then placed with ``shard_volume_tables`` over all
devices; ICI carries the psum all-reduces within a slice, DCN across
slices — the same intra/inter-node split UG/MPI gives the reference.

Single-host multi-device needs none of this (the default jax client
already sees all local devices).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Returns True if a multi-process runtime was started."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return False
    n = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    if n <= 1:
        return False
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=n, process_id=pid)
    return True


def global_device_mesh():
    """1-D element-sharding mesh over every device in the job (all hosts)."""
    from .sharding import make_device_mesh
    return make_device_mesh(devices=jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0

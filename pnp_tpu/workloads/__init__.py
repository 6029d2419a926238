from .common import ScalarContext, make_scalar_context
from .pb import solve_pb
from .stationary_diffusion import run_stationary_diffusion
from .stationary_pnp import run_stationary_pnp, split_fields
from .instationary_pnp import run_instationary_pnp
from .instationary_pnp_from_pb import (
    build_pnp_system, run_instationary_pnp_from_pb)
from .distributed_pnp import (
    build_dist_pnp_system, run_distributed_pnp_from_pb, solve_pb_distributed)

__all__ = [
    "ScalarContext", "make_scalar_context", "solve_pb",
    "run_stationary_diffusion", "run_stationary_pnp", "split_fields",
    "run_instationary_pnp", "build_pnp_system",
    "run_instationary_pnp_from_pb", "build_dist_pnp_system",
    "run_distributed_pnp_from_pb", "solve_pb_distributed",
]

"""Neumann flux boundary terms.

Parity: the reference accumulates ``j * phi_i * factor`` on non-Dirichlet
boundary faces, with j looked up from the per-boundary-segment flux
container (src/pb_operator.hh:180-191, src/pnp_operator.hh:276-313). Here
the lookup is precomputed into ``BoundaryTables.flux``/``neumann`` and the
whole boundary term is one batched contraction + scatter.

The flux is independent of the solution, so it contributes nothing to the
Jacobian.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.geometry import BoundaryTables
from .common import bqfactor


def flux_residual_el(t: BoundaryTables, component: int, cylindrical, pi):
    """Per-boundary-edge residual (B, ndof_el) for one field component."""
    f = bqfactor(t, cylindrical, pi)                  # (B, nqb)
    j = t.flux[:, component] * t.neumann[:, component]  # (B,)
    return jnp.einsum("b,bq,bqi->bi", j, f, t.shape)

"""Shared workload plumbing: discrete contexts tying config + mesh + space.

This is the rebuild's equivalent of the reference drivers' setup phases
(GFS + constraints + fluxContainer construction,
src/instationary_pnp_from_pb_md.hh:125-176): one context object holds the
device-ready tables every solver phase needs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..config import Sysparams
from ..fem.space import FunctionSpace
from ..fem.geometry import (
    VolumeTables, BoundaryTables, build_volume_tables, build_boundary_tables)
from ..fem import constraints as C
from ..fem import assembly as A
from ..operators import boundary as OB

Array = Any


@dataclasses.dataclass
class ScalarContext:
    """Everything needed to assemble/solve one scalar field component."""

    space: FunctionSpace
    vt: VolumeTables
    bt: BoundaryTables
    component: int
    free: Array          # (ndof,) bool — not Dirichlet-constrained
    dirichlet: Array     # (ndof,) configured Dirichlet values (0 elsewhere)
    flux_vector: Array   # (ndof,) assembled Neumann flux contribution
    sys: Sysparams

    @property
    def ndof(self) -> int:
        return self.space.ndof

    @property
    def dofmap(self):
        return self.vt.dofmap

    def constrain(self, r: Array) -> Array:
        return jnp.where(self.free, r, 0.0)

    def scatter(self, r_el: Array) -> Array:
        return A.scatter_add(r_el, self.vt.dofmap, self.space.ndof)


def make_scalar_context(
    sys: Sysparams,
    space: FunctionSpace,
    component: int,
    quad_order: int,
    boundary_quad_order: int | None = None,
    flux_cylindrical: bool | None = None,
) -> ScalarContext:
    """Build tables + constraints for one field component.

    ``flux_cylindrical`` controls the axisymmetric weight on the Neumann
    boundary term (the reference applies it in PB/Poisson/PNP boundary
    integrals, src/pb_operator.hh:174-176); defaults to ``sys.cylindrical``.

    The requested quadrature order is raised to 2*degree so higher-order
    spaces are never under-integrated (the reference hard-codes intorder=3
    for every PDEGREE, which silently degrades its P3 variant — a
    documented deviation, not replicated).
    """
    mesh = space.mesh
    quad_order = max(quad_order, 2 * space.degree)
    if boundary_quad_order is None:
        boundary_quad_order = quad_order
    vt = build_volume_tables(space, quad_order)
    bt = build_boundary_tables(
        space,
        boundary_quad_order if boundary_quad_order is not None else quad_order,
        C.flux_table(sys, mesh),
        C.neumann_flags(sys, mesh),
    )
    free = jnp.asarray(C.free_dof_mask(space, sys, component))
    dirichlet = jnp.asarray(C.dirichlet_dof_values(space, sys, component))
    cyl = sys.cylindrical if flux_cylindrical is None else flux_cylindrical
    r_el = OB.flux_residual_el(bt, component, cyl, sys.pi)
    flux_vector = A.scatter_add(r_el, bt.dofmap, space.ndof)
    return ScalarContext(
        space=space, vt=vt, bt=bt, component=component,
        free=free, dirichlet=dirichlet, flux_vector=flux_vector, sys=sys)

"""Precomputed per-element geometry/basis tables for batched assembly.

TPU-native replacement for the per-quadrature-point geometry queries the
reference makes inside its hot element loops
(``jacobianInverseTransposed`` / ``integrationElement`` / basis evaluation,
reference: src/pb_operator.hh:77-110): for affine triangles everything is
precomputed once into dense arrays, so each operator evaluation is a chain of
einsum contractions over all elements at once.

All tables are plain ``jnp`` arrays; a pytree dataclass keeps them together.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..meshio.mesh import Mesh, LOCAL_EDGES
from .quadrature import triangle_rule, interval_rule
from .space import FunctionSpace

_REF_VERTS = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VolumeTables:
    """Per-element volume quadrature tables.

    shape:   (nq, ndof_el) basis values at reference quad points.
    gradphi: (E, nq, ndof_el, 2) physical basis gradients.
    qw:      (E, nq) quad weight * |det J|  (no axisymmetric factor).
    qy:      (E, nq) global y coordinate at quad points (axisymmetric radius).
    dofmap:  (E, ndof_el) int32 global dof map.
    """

    shape: Any
    gradphi: Any
    qw: Any
    qy: Any
    dofmap: Any

    @property
    def num_elements(self) -> int:
        return self.dofmap.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BoundaryTables:
    """Per-boundary-edge quadrature tables (element-basis trace).

    shape:  (B, nqb, ndof_el) adjacent-element basis values at edge quad pts.
    qw:     (B, nqb) quad weight * edge length.
    qy:     (B, nqb) global y at edge quad points.
    dofmap: (B, ndof_el) int32 dof map of the adjacent element.
    flux:   (B, ncomp) flux value per edge per field component
            (the reference's fluxContainer,
            src/instationary_pnp_from_pb_md.hh:151-176).
    neumann:(B, ncomp) 1.0 where the edge is Neumann for that component
            (flux terms only apply on non-Dirichlet faces,
            src/pb_operator.hh:180-191).
    """

    shape: Any
    qw: Any
    qy: Any
    dofmap: Any
    flux: Any
    neumann: Any


def element_jacobians(mesh: Mesh):
    """Affine maps: J (E,2,2), |detJ| (E,), J^{-T} (E,2,2) as numpy."""
    x = mesh.nodes[mesh.tris]  # (E, 3, 2)
    J = np.stack([x[:, 1] - x[:, 0], x[:, 2] - x[:, 0]], axis=2)  # columns
    det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
    inv = np.empty_like(J)
    inv[:, 0, 0] = J[:, 1, 1]
    inv[:, 0, 1] = -J[:, 0, 1]
    inv[:, 1, 0] = -J[:, 1, 0]
    inv[:, 1, 1] = J[:, 0, 0]
    inv /= det[:, None, None]
    jinv_t = np.swapaxes(inv, 1, 2)
    return J, np.abs(det), jinv_t


def build_volume_tables(space: FunctionSpace, quad_order: int) -> VolumeTables:
    mesh = space.mesh
    pts, wts = triangle_rule(quad_order)
    shape = space.ref.values(pts)                  # (nq, ndof)
    gref = space.ref.gradients(pts)                # (nq, ndof, 2)
    J, absdet, jinv_t = element_jacobians(mesh)
    # physical gradient: J^{-T} @ grad_ref
    gradphi = np.einsum("eab,qib->eqia", jinv_t, gref)
    qw = wts[None, :] * absdet[:, None]
    x0 = mesh.nodes[mesh.tris[:, 0]]               # (E, 2)
    qpts = x0[:, None, :] + np.einsum("eab,qb->eqa", J, pts)
    return VolumeTables(
        shape=jnp.asarray(shape),
        gradphi=jnp.asarray(gradphi),
        qw=jnp.asarray(qw),
        qy=jnp.asarray(qpts[..., 1]),
        dofmap=jnp.asarray(space.dofmap),
    )


def build_boundary_tables(
    space: FunctionSpace,
    quad_order: int,
    flux: np.ndarray,
    neumann: np.ndarray,
) -> BoundaryTables:
    """Build edge quadrature tables.

    ``flux`` is (B, ncomp) per-edge flux values; ``neumann`` is (B, ncomp)
    booleans/floats gating the flux term per component.
    """
    mesh = space.mesh
    t, w = interval_rule(quad_order)               # (nqb,), on [0, 1]
    nqb = t.shape[0]
    B = mesh.num_boundary_edges

    # element-local coordinates of edge quad points
    la = LOCAL_EDGES[mesh.edge_local, 0]           # (B,)
    lb = LOCAL_EDGES[mesh.edge_local, 1]
    ra = _REF_VERTS[la]                            # (B, 2)
    rb = _REF_VERTS[lb]
    locs = ra[:, None, :] * (1 - t)[None, :, None] + rb[:, None, :] * t[None, :, None]

    # basis values of the adjacent element at those local points
    shape = np.empty((B, nqb, space.ref.ndof))
    flat = locs.reshape(-1, 2)
    vals = space.ref.values(flat)                  # (B*nqb, ndof)
    shape[:] = vals.reshape(B, nqb, -1)

    # physical quad points and edge lengths (straight edges)
    xa = mesh.nodes[mesh.tris[mesh.edge_tri, 0]]   # x0 of adjacent tri, (B, 2)
    J, _, _ = element_jacobians(mesh)
    Jb = J[mesh.edge_tri]                          # (B, 2, 2)
    qpts = xa[:, None, :] + np.einsum("bij,bqj->bqi", Jb, locs)
    pa = mesh.nodes[mesh.edges[:, 0]]
    pb = mesh.nodes[mesh.edges[:, 1]]
    length = np.linalg.norm(pb - pa, axis=1)       # (B,)
    qw = w[None, :] * length[:, None]

    return BoundaryTables(
        shape=jnp.asarray(shape),
        qw=jnp.asarray(qw),
        qy=jnp.asarray(qpts[..., 1]),
        dofmap=jnp.asarray(space.dofmap[mesh.edge_tri]),
        flux=jnp.asarray(flux),
        neumann=jnp.asarray(neumann.astype(np.float64)),
    )

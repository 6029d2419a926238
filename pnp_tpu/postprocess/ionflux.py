"""Per-surface ion current post-processing.

Parity: reference ``calcIonFlux`` (src/ionFlux.hh:7-96): for every boundary
face, evaluate (phi, c+, c-) and their gradients at the face center and
accumulate per physical group

    ip[pg] += (-grad c+ + c+ grad phi) . n * w
    im[pg] += (-grad c- - c- grad phi) . n * w,   w = |face| (cyl: * 2 pi y)

NOTE the reference's drift-term signs are opposite to the physical ion
fluxes j+- = -grad c -+ c grad phi; ``convention="reference"`` (default)
reproduces the reference's current.dat numbers, ``convention="physical"``
uses the physically-signed fluxes. The reference's swapped cp/cm GFS
argument order (src/instationary_pnp_from_pb_md.hh:443 vs ionFlux.hh:8) is
a no-op for identical spaces and is not replicated.

Unlike the reference (which accumulates per-rank partial sums only, no MPI
reduction), the batched segment-sum here is globally complete by
construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.geometry import element_jacobians
from ..fem.space import FunctionSpace
from ..meshio.mesh import LOCAL_EDGES

Array = Any
_REF_VERTS = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IonFluxTables:
    shape_c: Any    # (B, n) element basis at face center
    grad_c: Any     # (B, n, 2) physical basis gradients at face center
    normal: Any     # (B, 2) outward unit normal
    weight: Any     # (B,) |face| (* 2 pi y_center when cylindrical)
    dofmap: Any     # (B, n)
    edge_phys: Any  # (B,) int32
    n_surfaces: int


def build_ionflux_tables(space: FunctionSpace, cylindrical: bool,
                         pi: float, n_surfaces: int) -> IonFluxTables:
    mesh = space.mesh
    la = LOCAL_EDGES[mesh.edge_local]                 # (B, 2) local vertices
    ra = _REF_VERTS[la[:, 0]]
    rb = _REF_VERTS[la[:, 1]]
    loc_c = 0.5 * (ra + rb)                           # (B, 2) ref coords

    shape_c = space.ref.values(loc_c)                 # (B, n)
    gref = space.ref.gradients(loc_c)                 # (B, n, 2)
    _, _, jinv_t = element_jacobians(mesh)
    jt = jinv_t[mesh.edge_tri]                        # (B, 2, 2)
    grad_c = np.einsum("bad,bid->bia", jt, gref)

    pa = mesh.nodes[mesh.edges[:, 0]]
    pb = mesh.nodes[mesh.edges[:, 1]]
    # use triangle-local ordering for a guaranteed-outward normal
    va = mesh.nodes[np.take_along_axis(mesh.tris[mesh.edge_tri], la, axis=1)]
    d = va[:, 1] - va[:, 0]                           # CCW edge direction
    length = np.linalg.norm(d, axis=1)
    normal = np.stack([d[:, 1], -d[:, 0]], axis=1) / length[:, None]

    center = 0.5 * (pa + pb)
    weight = length.copy()
    if cylindrical:
        weight *= 2.0 * pi * center[:, 1]

    return IonFluxTables(
        shape_c=jnp.asarray(shape_c),
        grad_c=jnp.asarray(grad_c),
        normal=jnp.asarray(normal),
        weight=jnp.asarray(weight),
        dofmap=jnp.asarray(space.dofmap[mesh.edge_tri]),
        edge_phys=jnp.asarray(mesh.edge_phys),
        n_surfaces=n_surfaces,
    )


def calc_ion_flux(t: IonFluxTables, phi: Array, cp: Array, cm: Array,
                  convention: str = "reference"):
    """Returns (ip, im) arrays of shape (n_surfaces,)."""
    phie, cpe, cme = phi[t.dofmap], cp[t.dofmap], cm[t.dofmap]
    cp_c = jnp.einsum("bi,bi->b", cpe, t.shape_c)
    cm_c = jnp.einsum("bi,bi->b", cme, t.shape_c)
    gphi = jnp.einsum("bi,bia->ba", phie, t.grad_c)
    gcp = jnp.einsum("bi,bia->ba", cpe, t.grad_c)
    gcm = jnp.einsum("bi,bia->ba", cme, t.grad_c)
    sign = 1.0 if convention == "reference" else -1.0
    jp = (-gcp + sign * cp_c[:, None] * gphi)
    jm = (-gcm - sign * cm_c[:, None] * gphi)
    fp = jnp.einsum("ba,ba->b", jp, t.normal) * t.weight
    fm = jnp.einsum("ba,ba->b", jm, t.normal) * t.weight
    ip = jax.ops.segment_sum(fp, t.edge_phys, num_segments=t.n_surfaces)
    im = jax.ops.segment_sum(fm, t.edge_phys, num_segments=t.n_surfaces)
    return ip, im

"""Structured rectangle meshes (testing + convergence studies).

The reference has no structured-mesh path (all Gmsh), but analytic
validation (SURVEY.md section 4, one_wall_dh) needs controlled refinement.

Boundary physical groups follow the one_wall convention
(test/one_wall_dh/one_wall.geo): 0 = left wall (x=0), 1 = right (x=Lx),
2 = bottom (y=0), 3 = top (y=Ly).
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh, build_edge_adjacency


def rect_mesh(nx: int, ny: int, Lx: float, Ly: float, y0: float = 0.0) -> Mesh:
    xs = np.linspace(0.0, Lx, nx + 1)
    ys = np.linspace(y0, y0 + Ly, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    nodes = np.stack([X.ravel(), Y.ravel()], axis=1)

    def nid(i, j):
        return i * (ny + 1) + j

    tris = []
    for i in range(nx):
        for j in range(ny):
            a, b = nid(i, j), nid(i + 1, j)
            c, d = nid(i + 1, j + 1), nid(i, j + 1)
            tris.append([a, b, c])
            tris.append([a, c, d])
    tris = np.array(tris, dtype=np.int32)

    edges, phys = [], []
    for j in range(ny):  # left (0) and right (1)
        edges.append([nid(0, j), nid(0, j + 1)]); phys.append(0)
        edges.append([nid(nx, j), nid(nx, j + 1)]); phys.append(1)
    for i in range(nx):  # bottom (2) and top (3)
        edges.append([nid(i, 0), nid(i + 1, 0)]); phys.append(2)
        edges.append([nid(i, ny), nid(i + 1, ny)]); phys.append(3)
    edges = np.array(edges, dtype=np.int32)
    edge_tri, edge_local = build_edge_adjacency(tris, edges)
    mesh = Mesh(nodes=nodes, tris=tris,
                tri_phys=np.zeros(len(tris), dtype=np.int32),
                edges=edges, edge_phys=np.array(phys, dtype=np.int32),
                edge_tri=edge_tri, edge_local=edge_local)
    mesh.validate()
    return mesh

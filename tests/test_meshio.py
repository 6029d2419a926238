"""Mesh ingestion tests against the reference's shipped Gmsh fixtures.

Node/element counts cross-checked with SURVEY.md / BASELINE.md:
one_wall 46/90, sphere 213/424, cylinder 311/620, pore 3048/6094.
"""

import numpy as np
import pytest

from pnp_tpu.meshio import read_gmsh, LOCAL_EDGES

CASES = [
    ("one_wall_dh/one_wall.msh", 46, 90),
    ("sphere_pb/sphere.msh", 213, 424),
    ("cylinder.msh", 311, 620),
    ("pore.msh", 320, 638),
    ("pore_pnp/pore.msh", 3048, 6094),
    ("mesh.msh", None, None),
]


@pytest.mark.parametrize("rel,n_nodes,n_tris", CASES)
def test_counts_and_structure(ref_test_dir, rel, n_nodes, n_tris):
    mesh = read_gmsh(str(ref_test_dir / rel))
    if n_nodes is not None:
        assert mesh.num_nodes == n_nodes
        # gmsh "$Elements" counts boundary lines + triangles
        assert mesh.num_tris + mesh.num_boundary_edges == n_tris
    assert mesh.num_boundary_edges > 0
    mesh.validate()
    # all triangles counter-clockwise after orientation fix
    x = mesh.nodes[mesh.tris]
    det = (x[:, 1, 0] - x[:, 0, 0]) * (x[:, 2, 1] - x[:, 0, 1]) - (
        x[:, 2, 0] - x[:, 0, 0]) * (x[:, 1, 1] - x[:, 0, 1])
    assert (det > 0).all()


def test_one_wall_physical_groups(ref_test_dir):
    mesh = read_gmsh(str(ref_test_dir / "one_wall_dh/one_wall.msh"))
    # the .geo defines physical lines 0..3 and physical surface 12
    assert set(np.unique(mesh.edge_phys)) == {0, 1, 2, 3}
    assert set(np.unique(mesh.tri_phys)) == {12}
    # domain is [0,5]x[0,2] (half box width 10/2)
    assert mesh.nodes[:, 0].min() == pytest.approx(0.0)
    assert mesh.nodes[:, 0].max() == pytest.approx(5.0)
    assert mesh.nodes[:, 1].max() == pytest.approx(2.0)
    # total area from cross products = 10
    x = mesh.nodes[mesh.tris]
    det = (x[:, 1, 0] - x[:, 0, 0]) * (x[:, 2, 1] - x[:, 0, 1]) - (
        x[:, 2, 0] - x[:, 0, 0]) * (x[:, 1, 1] - x[:, 0, 1])
    assert det.sum() / 2 == pytest.approx(10.0, rel=1e-12)


def test_boundary_adjacency(ref_test_dir):
    mesh = read_gmsh(str(ref_test_dir / "one_wall_dh/one_wall.msh"))
    tri_v = mesh.tris[mesh.edge_tri]
    le = LOCAL_EDGES[mesh.edge_local]
    got = np.take_along_axis(tri_v, le, axis=1)
    assert (np.sort(got, axis=1) == np.sort(mesh.edges, axis=1)).all()

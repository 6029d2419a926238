"""Native C++ meshkit vs pure-Python parser parity + partitioner sanity."""

import numpy as np
import pytest

from pnp_tpu.meshio import read_gmsh
from pnp_tpu.meshio.native import (
    native_available, read_gmsh_native, partition_elements)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for meshkit")

MESHES = ["one_wall_dh/one_wall.msh", "sphere_pb/sphere.msh",
          "cylinder.msh", "pore_pnp/pore.msh"]


@pytest.mark.parametrize("rel", MESHES)
def test_native_matches_python(ref_test_dir, rel):
    p = str(ref_test_dir / rel)
    a = read_gmsh(p)
    b = read_gmsh_native(p)
    np.testing.assert_array_equal(a.nodes, b.nodes)
    np.testing.assert_array_equal(a.tris, b.tris)
    np.testing.assert_array_equal(a.tri_phys, b.tri_phys)
    np.testing.assert_array_equal(a.edges, b.edges)
    np.testing.assert_array_equal(a.edge_phys, b.edge_phys)
    np.testing.assert_array_equal(a.edge_tri, b.edge_tri)
    np.testing.assert_array_equal(a.edge_local, b.edge_local)


@pytest.mark.parametrize("nparts", [2, 4, 8])
def test_partition_is_balanced_permutation(ref_test_dir, nparts):
    p = str(ref_test_dir / "pore_pnp/pore.msh")
    mesh = read_gmsh(p)
    perm, off = partition_elements(p, nparts)
    E = mesh.num_tris
    assert sorted(perm.tolist()) == list(range(E))
    assert off[0] == 0 and off[-1] == E
    sizes = np.diff(off)
    assert sizes.max() <= -(-E // nparts) + 1  # near-equal blocks
    # locality: most of each part's element neighbors are inside the part
    part_of = np.empty(E, dtype=int)
    for k in range(nparts):
        part_of[perm[off[k]:off[k + 1]]] = k
    # count cut edges via shared-edge adjacency
    from collections import defaultdict
    owner = {}
    cut = interior = 0
    for e in range(E):
        t = mesh.tris[e]
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            key = (min(a, b), max(a, b))
            if key in owner:
                if part_of[owner[key]] == part_of[e]:
                    interior += 1
                else:
                    cut += 1
            else:
                owner[key] = e
    assert cut / max(cut + interior, 1) < 0.25, (cut, interior)

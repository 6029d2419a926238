"""Writer outputs: VTU parses as XML, .dat layouts match the reference."""

import xml.etree.ElementTree as ET

import numpy as np
import pytest

from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio.structured import rect_mesh
from pnp_tpu.io.writers import write_dat, write_pnp_dat, write_vtu, CurrentWriter


@pytest.fixture(scope="module")
def setup():
    mesh = rect_mesh(4, 3, 1.0, 1.0)
    space = FunctionSpace(mesh, 1)
    u = space.dof_coords[:, 0] + 2 * space.dof_coords[:, 1]
    return mesh, space, u


def test_vtu_is_valid_xml(tmp_path, setup):
    mesh, space, u = setup
    path = str(tmp_path / "f.vtu")
    write_vtu(space, {"phi": u, "cp": u * 2}, path)
    root = ET.parse(path).getroot()
    assert root.tag == "VTKFile"
    piece = root.find(".//Piece")
    assert int(piece.get("NumberOfPoints")) == mesh.num_nodes
    assert int(piece.get("NumberOfCells")) == mesh.num_tris
    names = [d.get("Name") for d in root.findall(".//PointData/DataArray")]
    assert names == ["phi", "cp"]
    conn = root.find(".//DataArray[@Name='connectivity']").text.split()
    assert len(conn) == 3 * mesh.num_tris


def test_dat_layout_and_values(tmp_path, setup):
    """u = x + 2y: every element row must carry value at center and the
    exact gradient (1, 2)."""
    mesh, space, u = setup
    path = str(tmp_path / "u.dat")
    write_dat(space, u, path)
    rows = [l.split() for l in open(path)]
    assert len(rows) == mesh.num_tris
    for r in rows:
        x, y, v, gx, gy = map(float, r)
        # columns print at precision 5 (reference layout): compare there
        assert v == pytest.approx(x + 2 * y, abs=2e-5)
        assert gx == pytest.approx(1.0, abs=1e-5)
        assert gy == pytest.approx(2.0, abs=1e-5)


def test_pnp_dat_columns(tmp_path, setup):
    mesh, space, u = setup
    path = str(tmp_path / "pnp.dat")
    write_pnp_dat(space, u, 2 * u, 3 * u, path)
    cols = open(path).readline().split()
    # x y | phi cp cm | gphi(2) gcp(2) gcm(2)
    assert len(cols) == 2 + 3 + 6


def test_current_writer(tmp_path):
    w = CurrentWriter(str(tmp_path / "c.dat"))
    w.write(1.0, np.array([1.5, 2.5]), np.array([-1.0, 0.25]))
    w.close()
    cols = open(str(tmp_path / "c.dat")).read().split()
    assert cols[0] == "1" and float(cols[1]) == 1.5 and float(cols[2]) == -1.0

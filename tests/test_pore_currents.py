"""Longer pore_pnp run: ion-current time series sanity.

The production observable is current.dat (per-surface ion currents each
outputFreq steps, reference src/instationary_pnp_from_pb_md.hh:444-451).
Under the 24.1 kT/e bias the pore current must settle toward a steady
value; currents on zero-flux Neumann side walls stay comparatively small.
"""

import numpy as np
import pytest

from pnp_tpu.config import read_config
from pnp_tpu.fem.space import FunctionSpace
from pnp_tpu.meshio import read_gmsh
from pnp_tpu.workloads.instationary_pnp_from_pb import run_instationary_pnp_from_pb


@pytest.mark.slow
def test_pore_current_stabilizes(ref_test_dir):
    cfg = read_config(str(ref_test_dir / "pore_pnp/pore.cfg"))
    mesh = read_gmsh(cfg.meshfile)
    space = FunctionSpace(mesh, 1)
    res = run_instationary_pnp_from_pb(cfg, space, n_steps=40)
    hist = res.current_history
    assert len(hist) == 4  # outputFreq = 10, first output at step 0
    times = [h[0] for h in hist]
    # reference cadence: output when i % outputFreq == 0, so the first row
    # lands after the first step (time = tau), then every 10 steps
    assert times == pytest.approx([1.0, 11.0, 21.0, 31.0])
    # all currents finite; fields sane
    for _, ip, im in hist:
        assert np.isfinite(ip).all() and np.isfinite(im).all()
    cp = np.asarray(res.cp)
    assert np.isfinite(cp).all()
    # inflow(3)/outflow(4) currents approach steadiness: the last two
    # samples differ far less than the first two (initial transient)
    def delta(a, b):
        return np.abs(np.asarray(a) - np.asarray(b)).max()
    ip_first = delta(hist[0][1], hist[1][1])
    ip_last = delta(hist[-2][1], hist[-1][1])
    assert ip_last < ip_first

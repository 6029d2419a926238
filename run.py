#!/usr/bin/env python3
"""Launcher shim: ``python run.py -s BCGS_SSORk -p 1 -n 1 config.cfg``
(the reference's bin/dune_pnp.py interface; see pnp_tpu/cli.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pnp_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())

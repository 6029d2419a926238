#!/usr/bin/env python
"""Pre-commit gate: importability + fast CPU test subset + bench dry-build.

Run before EVERY commit that touches ``pnp_tpu/`` (VERDICT r4 item 2 —
three rounds in a row the committed artifact was broken by an untested
late change). ~2-3 min on CPU.

Usage:  python tools/preflight.py [--fast]
  --fast skips the test subset (imports + bench dry-build only, ~30 s).

Exit code 0 = safe to commit.
"""
from __future__ import annotations

import importlib
import os
import pkgutil
import subprocess
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAST_TESTS = [
    "tests/test_block_ras.py",
    "tests/test_shipped_configs.py",
    "tests/test_cli.py",
    "tests/test_hoist.py",
]


def _fail(msg: str) -> None:
    print(f"PREFLIGHT FAIL: {msg}")
    sys.exit(1)


def check_imports() -> None:
    """Import every module under pnp_tpu (catches deleted-symbol renames
    only at call time, but catches syntax/import errors everywhere)."""
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import pnp_tpu
    n = 0
    for mod in pkgutil.walk_packages(pnp_tpu.__path__, "pnp_tpu."):
        importlib.import_module(mod.name)
        n += 1
    print(f"  imports: {n} modules OK")


def check_entry() -> None:
    """__graft_entry__.entry() must build (not run) without error."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge
    fn, args = ge.entry()
    print("  __graft_entry__.entry(): OK")


def check_bench_drybuild() -> None:
    """bench.py --drybuild: imports + state construction, no TPU work."""
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                        "--drybuild"],
                       capture_output=True, text=True, timeout=600,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    if r.returncode != 0:
        _fail(f"bench.py --drybuild rc={r.returncode}\n{r.stdout[-2000:]}"
              f"\n{r.stderr[-2000:]}")
    print("  bench.py --drybuild: OK")


def check_tests() -> None:
    r = subprocess.run([sys.executable, "-m", "pytest", "-q", "-x",
                        *FAST_TESTS], cwd=REPO, timeout=900)
    if r.returncode != 0:
        _fail("fast test subset failed")
    print("  fast tests: OK")


def main() -> None:
    t0 = time.time()
    fast = "--fast" in sys.argv
    print("preflight: imports ...")
    check_imports()
    print("preflight: entry ...")
    check_entry()
    print("preflight: bench dry-build ...")
    check_bench_drybuild()
    if not fast:
        print("preflight: fast test subset ...")
        check_tests()
    print(f"PREFLIGHT OK ({time.time() - t0:.0f} s)")


if __name__ == "__main__":
    main()

"""Phase timers + throughput counters + jax profiler hooks.

The reference has no tracing/profiling at all (SURVEY.md section 5) —
only a verbosity integer. Here: wall-clock phase timers that
block_until_ready their outputs (honest device timing), DOFs/s counters
(the headline metric in BASELINE.md), and a context manager around
``jax.profiler.trace`` for on-demand XLA traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@dataclasses.dataclass
class Counters:
    dofs_assembled: int = 0
    krylov_iterations: int = 0
    newton_iterations: int = 0
    steps: int = 0

    def dofs_per_sec(self, elapsed: float) -> float:
        return self.dofs_assembled / max(elapsed, 1e-12)


class PhaseTimer:
    """Accumulating named-phase wall timer with device sync."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"  {name:<28s} {self.totals[name]:10.3f}s "
                         f"x{self.counts[name]}")
        return "\n".join(lines)


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """jax.profiler trace when a directory is given, no-op otherwise."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield

"""Tracing/profiling hooks (SURVEY.md §5).

The reference has only ad-hoc CSV timing rows (Slam.jl:293). Here:

- :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-compatible XLA trace;
- :class:`PhaseTimer` — per-phase wall-clock accumulation (build /
  linearize / solve / write-back) with a CSV-style report, the
  ``timinglog`` analogue;
- :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so solver
  phases show up named in the device trace.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rome_tpu/trace"):
    """Capture an XLA device trace for TensorBoard (jax.profiler.trace)."""
    import jax

    with jax.profiler.trace(logdir):
        yield logdir


@contextlib.contextmanager
def annotate(name: str):
    """Name a region in the device trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class PhaseTimer:
    """Accumulating per-phase wall-clock timer; rows() mirrors the
    reference's per-cycle timing CSV (Slam.jl:219-293)."""

    totals: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def rows(self):
        return [
            dict(phase=k, total_s=round(v, 4), calls=self.counts[k],
                 mean_s=round(v / self.counts[k], 4))
            for k, v in sorted(self.totals.items())
        ]

    def report(self) -> str:
        return "\n".join(
            f"{r['phase']},{r['total_s']},{r['calls']},{r['mean_s']}"
            for r in self.rows()
        )

"""Tracing / profiling as a first-class module.

The reference has no profiling beyond wall-clock prints (utils/sam_utils.py:23,
trainer_generic.py:1072-1094).  Here every pipeline stage runs under a named
`jax.profiler.TraceAnnotation` and a `Timer` that records per-stage wall times
for the benchmark reports.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class Timer:
    """Accumulates named wall-clock spans; used by bench.py and the CLI."""

    spans: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            with jax.profiler.TraceAnnotation(name):
                yield
        finally:
            dt = time.perf_counter() - t0
            self.spans[name] = self.spans.get(name, 0.0) + dt

    def report(self) -> dict:
        return dict(self.spans)

    def total(self) -> float:
        return sum(self.spans.values())

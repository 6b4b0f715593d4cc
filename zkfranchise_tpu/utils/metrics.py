"""Structured metrics / tracing (SURVEY.md §5 "Tracing / profiling").

The reference's only instrumentation is a wall-clock print
(/root/reference/ts_inputs/src/example.ts:364-365).  Here: per-stage timers
with JSON-lines output (proofs/s, stage latencies) and optional
jax.profiler trace capture.  No secrets are ever logged (the reference
prints private keys at internal/inputs.go:61-62 — deliberately not
replicated).
"""
from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field


@dataclass
class Metrics:
    sink: object = None                       # file-like; default stderr
    counters: dict = field(default_factory=dict)
    timers: dict = field(default_factory=dict)

    def _emit(self, record: dict) -> None:
        out = self.sink or sys.stderr
        record["ts"] = time.time()
        print(json.dumps(record), file=out, flush=True)

    @contextlib.contextmanager
    def stage(self, name: str, **labels):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.timers[name] = self.timers.get(name, 0.0) + dt
            self._emit({"kind": "stage", "stage": name,
                        "seconds": round(dt, 6), **labels})

    def count(self, name: str, value: float = 1, **labels) -> None:
        self.counters[name] = self.counters.get(name, 0) + value
        self._emit({"kind": "counter", "name": name, "value": value,
                    **labels})

    def throughput(self, name: str, items: int, seconds: float,
                   **labels) -> None:
        self._emit({"kind": "throughput", "name": name, "items": items,
                    "seconds": round(seconds, 6),
                    "per_second": round(items / seconds, 3) if seconds else 0,
                    **labels})


@contextlib.contextmanager
def jax_trace(log_dir: str | None):
    """Wraps a block in a jax.profiler trace when log_dir is given."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield

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


def force(out) -> None:
    """Force completion of a pytree of device arrays by fetching ONE
    scalar from each leaf.

    TIMING HAZARD: on this repo's axon-tunneled TPU backend,
    jax.block_until_ready does NOT reliably wait for execution (it can
    return dispatch-only times — 0.1 ms for 60+ ms of device work), and
    fetching full arrays crawls through the tunnel.  A dependent scalar
    fetch is both correct and cheap — every timing loop (bench.py,
    scripts/profile_*.py, scripts/scaling_sweep.py) must synchronize
    through this function, never through block_until_ready.
    """
    import jax
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf[(0,) * leaf.ndim])


@contextlib.contextmanager
def device_timer(store: dict, name: str, out_ref: list):
    """Context manager that times a device computation honestly: caller
    appends outputs to out_ref; exit forces them before reading the
    clock (see force())."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        force(out_ref)
        store[name] = store.get(name, 0.0) + time.perf_counter() - t0

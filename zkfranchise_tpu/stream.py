"""Continuous proof-stream driver with checkpoint/resume.

Production shape of the framework: a stream of voter-proof requests is
consumed in fixed-size batches through the TPU prover; finished proofs are
written as snarkjs-format artifacts; the batch cursor is checkpointed so a
restarted process resumes where it left off (SURVEY.md §5
"Checkpoint / resume" — the reference's only persistent state is the
artifact directory itself).
"""
from __future__ import annotations

import json
import time
from dataclasses import asdict
from pathlib import Path

import numpy as np

from . import inputs as inp
from .groth16.device import DeviceProver
from .models.census import inputs_to_limbs
from .utils.metrics import Metrics


class ProofStream:
    """Drives a DeviceProver over a list/iterator of CircuitInputs."""

    def __init__(self, prover: DeviceProver, out_dir: str | Path,
                 batch_size: int = 16, metrics: Metrics | None = None):
        self.prover = prover
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.batch_size = batch_size
        self.metrics = metrics or Metrics()
        self._ckpt_path = self.out_dir / "stream_checkpoint.json"

    @property
    def cursor(self) -> int:
        if self._ckpt_path.exists():
            return json.loads(self._ckpt_path.read_text())["cursor"]
        return 0

    def _save_cursor(self, cursor: int) -> None:
        tmp = self._ckpt_path.with_suffix(".tmp")
        tmp.write_text(json.dumps({"cursor": cursor,
                                   "batch_size": self.batch_size}))
        tmp.replace(self._ckpt_path)

    def run(self, voters: list, seed: int = 0) -> int:
        """Proves all voters from the checkpointed cursor onward.  XLA
        needs static shapes, so the final partial batch is proven as a
        LADDER of power-of-two sub-batches (37 -> 32 + 4 + 1) instead of
        padding to batch_size by repetition — a 1-voter tail costs one
        1-lane step, not a full-batch MSM.  Each ladder size compiles
        once and lands in the persistent JAX cache, so a long-running
        stream pays at most log2(batch_size) extra compiles ever.
        Returns the number of proofs produced this call."""
        start = self.cursor
        produced = 0
        base = start
        n = len(voters)
        while base < n:
            size = self.batch_size
            if n - base < size:                 # tail: pow2 ladder
                size = _prev_pow2(n - base)
            produced += self._prove_slice(voters, base, size, seed)
            base += size
        return produced

    def _prove_slice(self, voters, base, size, seed) -> int:
        arrs = inp.batch_to_arrays(voters[base:base + size],
                                   self.prover.circuit.n_levels)
        t0 = time.perf_counter()
        with self.metrics.stage("prove_batch", base=base, batch=size):
            proofs, pubs = self.prover.prove_batch(arrs, seed=seed + base)
        self.metrics.throughput("proofs", size, time.perf_counter() - t0)
        for i in range(size):
            d = self.out_dir / f"proof_{base + i:08d}"
            d.mkdir(exist_ok=True)
            (d / "proof.json").write_text(json.dumps(proofs[i].to_dict()))
            (d / "signals.json").write_text(
                json.dumps([str(x) for x in pubs[i]]))
        self._save_cursor(base + size)
        return size


def _prev_pow2(n: int) -> int:
    """Largest power of two <= n (n >= 1)."""
    return 1 << (n.bit_length() - 1)

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
        """Proves all voters from the checkpointed cursor onward; pads the
        final partial batch by repetition (static shapes for XLA).
        Returns the number of proofs produced this call."""
        n_levels = self.prover.circuit.n_levels
        start = self.cursor
        produced = 0
        for base in range(start, len(voters), self.batch_size):
            chunk = voters[base:base + self.batch_size]
            real = len(chunk)
            while len(chunk) < self.batch_size:
                chunk.append(chunk[-1])
            arrs = inp.batch_to_arrays(chunk, n_levels)
            t0 = time.perf_counter()
            with self.metrics.stage("prove_batch", base=base):
                proofs, pubs = self.prover.prove_batch(
                    arrs, seed=seed + base)
            self.metrics.throughput("proofs", real,
                                    time.perf_counter() - t0)
            for i in range(real):
                d = self.out_dir / f"proof_{base + i:08d}"
                d.mkdir(exist_ok=True)
                (d / "proof.json").write_text(
                    json.dumps(proofs[i].to_dict()))
                (d / "signals.json").write_text(
                    json.dumps([str(x) for x in pubs[i]]))
            produced += real
            self._save_cursor(base + real)
        return produced

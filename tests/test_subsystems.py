"""Aux-subsystem tests: config, artifacts manifest, metrics, zkey export
script plumbing (host-only, fast)."""
import json
import io
import pathlib

import pytest

from zkfranchise_tpu.config import Config
from zkfranchise_tpu.utils import artifacts
from zkfranchise_tpu.utils.metrics import Metrics


def test_config_defaults_match_reference():
    cfg = Config()
    assert cfg.circuit_name == "zkCensus"
    assert cfg.environment == "dev"
    assert cfg.n_levels == 160
    assert str(cfg.artifact_dir).endswith("artifacts/zkCensus/dev/160")


def test_config_validation():
    with pytest.raises(ValueError):
        Config(n_levels=8).validate()          # reference bound NLEVELS>=10
    with pytest.raises(ValueError):
        Config(n_levels=32, key_size=20).validate()  # key too large


def test_manifest(tmp_path):
    d = tmp_path / "zkCensus" / "dev" / "4"
    d.mkdir(parents=True)
    (d / "verification_key.json").write_text("{}")
    (d / "signals.json").write_text("[]")
    m = artifacts.write_manifest(d.parent)
    text = m.read_text()
    assert "### dev 4" in text
    assert "verification_key.json" in text and "`" in text


def test_proof_artifacts(tmp_path):
    artifacts.save_proof_artifacts(tmp_path, {"pi_a": ["1", "2", "1"]},
                                   [1, 2, 3])
    assert json.load(open(tmp_path / "proof.json"))["pi_a"][0] == "1"
    assert json.load(open(tmp_path / "signals.json")) == ["1", "2", "3"]


class _StubProver:
    """Duck-typed stand-in for DeviceProver: ProofStream only touches
    .circuit.n_levels and .prove_batch.  Counts calls so the resume test
    can assert no batch is re-proved."""

    class _C:
        n_levels = 16

    circuit = _C()

    def __init__(self, fail_after_batches=None):
        self.calls = 0
        self.sizes = []
        self.fail_after = fail_after_batches

    def prove_batch(self, arrs, seed=0):
        if self.fail_after is not None and self.calls >= self.fail_after:
            raise RuntimeError("injected crash")
        self.calls += 1
        B = arrs["address"].shape[-1]
        self.sizes.append(B)
        proofs = [type("P", (), {"to_dict": lambda self: {"pi_a": []}})()
                  for _ in range(B)]
        pubs = [[seed, i] for i in range(B)]
        return proofs, pubs


def test_stream_checkpoint_resume(tmp_path):
    """Kill the stream mid-run; a fresh ProofStream must resume from the
    cursor without duplicating or losing proofs (SURVEY.md §5 checkpoint
    row)."""
    from zkfranchise_tpu import inputs as inp
    from zkfranchise_tpu.stream import ProofStream

    voters = inp.mock_batch(16, 7, seed=5)
    out = tmp_path / "proofs"

    # first run crashes after 2 batches (batch_size=2 -> 4 proofs done)
    p1 = _StubProver(fail_after_batches=2)
    s1 = ProofStream(p1, out, batch_size=2)
    with pytest.raises(RuntimeError):
        s1.run(voters)
    assert s1.cursor == 4 and p1.calls == 2

    # resume with a new process-equivalent: picks up at the cursor
    p2 = _StubProver()
    s2 = ProofStream(p2, out, batch_size=2)
    produced = s2.run(voters)
    assert produced == 3                       # voters 4..6 only
    assert p2.calls == 2                       # batches [4:6], [6:7(padded)]
    assert s2.cursor == 7
    done = sorted(d.name for d in out.iterdir() if d.is_dir())
    assert done == [f"proof_{i:08d}" for i in range(7)]  # no dup/loss
    # a third run is a no-op
    p3 = _StubProver()
    assert ProofStream(p3, out, batch_size=2).run(voters) == 0
    assert p3.calls == 0


def test_metrics_jsonl():
    buf = io.StringIO()
    m = Metrics(sink=buf)
    with m.stage("witness", batch=4):
        pass
    m.count("proofs", 4)
    m.throughput("proofs", 8, 2.0)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert lines[0]["kind"] == "stage" and lines[0]["stage"] == "witness"
    assert lines[1]["value"] == 4
    assert lines[2]["per_second"] == 4.0
    assert m.timers["witness"] >= 0


def test_stream_tail_ladder(tmp_path):
    """The final partial batch runs as a pow2 ladder (11 @ batch 8 ->
    8 + 2 + 1), never padded by repetition — a 1-voter tail must not pay
    a full-batch MSM (r4 review weak #5)."""
    from zkfranchise_tpu import inputs as inp
    from zkfranchise_tpu.stream import ProofStream, _prev_pow2

    assert [_prev_pow2(n) for n in (1, 2, 3, 7, 8, 37)] == \
        [1, 2, 2, 4, 8, 32]
    voters = inp.mock_batch(16, 11, seed=6)
    p = _StubProver()
    s = ProofStream(p, tmp_path / "proofs", batch_size=8)
    assert s.run(voters) == 11
    assert p.sizes == [8, 2, 1]
    assert s.cursor == 11
    done = sorted(d.name for d in (tmp_path / "proofs").iterdir()
                  if d.is_dir())
    assert done == [f"proof_{i:08d}" for i in range(11)]

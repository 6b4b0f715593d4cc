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

"""Input-pipeline tests: schema parity with the reference generators."""
import json
from dataclasses import asdict

from zkfranchise_tpu import inputs as inp
from zkfranchise_tpu.ops import ff
from zkfranchise_tpu.utils import arbo, eth, smt

GOLDEN = "/root/reference/artifacts/zkCensus/dev/160/inputs_example.json"


def test_json_schema_matches_reference():
    ci = inp.mock_inputs(4, 3, seed=9)
    ours = json.loads(ci.to_json())
    ref = json.load(open(GOLDEN))
    assert list(ours.keys()) == list(ref.keys())
    assert len(ours["electionId"]) == 2
    assert len(ours["voteHash"]) == 2
    assert len(ours["censusSiblings"]) == 5  # n_levels + 1
    assert len(ours["sikSiblings"]) == 5


def test_password_encoding_matches_reference():
    # "password123" big-endian, BigToFF-reduced: value in the golden file
    pwd = ff.big_to_ff(int.from_bytes(b"password123", "big"))
    ref = json.load(open(GOLDEN))
    assert str(pwd) == ref["password"]


def test_votehash_encoding():
    # voteHash = BytesToArbo(availableWeight big-endian bytes); weight 10
    ref = json.load(open(GOLDEN))
    vh = arbo.bytes_to_arbo((10).to_bytes(1, "big"))
    assert [str(vh[0]), str(vh[1])] == ref["voteHash"]


def test_mock_inputs_self_consistent():
    ci = inp.mock_inputs(8, 4, seed=10)
    addr = int(ci.address)
    from zkfranchise_tpu.ops.poseidon_constants import poseidon_host
    sik = poseidon_host([addr, int(ci.password), int(ci.signature)])
    assert smt.verify_proof(int(ci.sikRoot), addr, sik,
                            [int(s) for s in ci.sikSiblings])
    assert smt.verify_proof(int(ci.censusRoot), addr,
                            int(ci.availableWeight),
                            [int(s) for s in ci.censusSiblings])
    nullifier = poseidon_host([int(ci.signature), int(ci.password),
                               int(ci.electionId[0]), int(ci.electionId[1])])
    assert str(nullifier) == ci.nullifier
    # round-trip through JSON
    assert inp.CircuitInputs.from_json(ci.to_json()) == ci


def test_mock_batch_shares_roots():
    batch = inp.mock_batch(8, 3, seed=2)
    roots = {(ci.censusRoot, ci.sikRoot) for ci in batch}
    assert len(roots) == 1  # one census, one SIK tree for all voters
    addrs = {ci.address for ci in batch}
    assert len(addrs) == 3


def test_signature_is_64_bytes_truncated_and_reduced():
    acct = eth.Account(12345)
    sig = acct.sik_signature()
    assert len(sig) == 64
    val = ff.big_to_ff(int.from_bytes(sig, "big"))
    assert 0 <= val < ff.P_FR

"""Arbo-compatible SMT tests (host tree build, proofs, golden parity)."""
import json
import random

import pytest

from zkfranchise_tpu.utils import arbo, smt

GOLDEN = "/root/reference/artifacts/zkCensus/dev/160/inputs_example.json"


def test_golden_proofs_verify():
    d = json.load(open(GOLDEN))
    addr = int(d["address"])
    from zkfranchise_tpu.ops.poseidon_constants import poseidon_host
    sik = poseidon_host([addr, int(d["password"]), int(d["signature"])])
    assert smt.verify_proof(int(d["censusRoot"]), addr,
                            int(d["availableWeight"]),
                            [int(s) for s in d["censusSiblings"]])
    assert smt.verify_proof(int(d["sikRoot"]), addr, sik,
                            [int(s) for s in d["sikSiblings"]])


def test_build_and_prove():
    rng = random.Random(3)
    tree = smt.SMT(max_levels=160)
    keys = [bytes(rng.randrange(256) for _ in range(20)) for _ in range(25)]
    for i, k in enumerate(keys):
        tree.add(k, 10 + i)
    for i, k in enumerate(keys):
        value, sibs = tree.gen_proof(k)
        assert value == 10 + i
        key_int = arbo.bytes_to_bigint(k)
        padded = sibs + [0] * (160 - len(sibs))
        assert smt.verify_proof(tree.root, key_int, 10 + i, padded)
    # non-member lookups fail
    with pytest.raises(KeyError):
        tree.gen_proof(b"\x01" * 20)


def test_insertion_order_independent():
    rng = random.Random(5)
    keys = [bytes(rng.randrange(256) for _ in range(20)) for _ in range(12)]
    t1 = smt.SMT(160)
    t2 = smt.SMT(160)
    for k in keys:
        t1.add(k, 7)
    for k in reversed(keys):
        t2.add(k, 7)
    assert t1.root == t2.root


def test_wrong_value_rejected():
    tree = smt.SMT(160)
    tree.add(b"\x42" * 20, 5)
    tree.add(b"\x43" * 20, 6)
    key_int = arbo.bytes_to_bigint(b"\x42" * 20)
    _, sibs = tree.gen_proof(b"\x42" * 20)
    padded = sibs + [0] * (160 - len(sibs))
    assert smt.verify_proof(tree.root, key_int, 5, padded)
    assert not smt.verify_proof(tree.root, key_int, 99, padded)


def test_duplicate_key_rejected():
    tree = smt.SMT(160)
    tree.add(b"\x01" * 20, 1)
    with pytest.raises(ValueError):
        tree.add(b"\x01" * 20, 2)


def test_batch_smt_parity():
    """Device-hashed batch builder (utils/smt_batch.py) is bit-equal to
    the host tree: same root, same sibling vectors, proofs verify."""
    from zkfranchise_tpu.utils import smt_batch

    rng = random.Random(11)
    keys = [bytes(rng.randrange(256) for _ in range(20)) for _ in range(300)]
    host = smt.SMT(max_levels=160)
    for i, k in enumerate(keys):
        host.add(k, 10 + i)
    batch = smt_batch.build_from_bytes(
        [(k, 10 + i) for i, k in enumerate(keys)], max_levels=160)
    assert batch.root == host.root
    for i, k in enumerate(rng.sample(keys, 25)):
        ki = arbo.bytes_to_bigint(k)
        v_b, sibs_b = batch.gen_proof(ki)
        v_h, sibs_h = host.gen_proof(k)
        assert (v_b, sibs_b) == (v_h, sibs_h)
    with pytest.raises(KeyError):
        batch.gen_proof(arbo.bytes_to_bigint(b"\x01" * 20))


def test_batch_smt_large():
    """2^12-leaf build: tier-batched device hashing; sampled proofs verify
    against the root (the at-scale path of SURVEY §2b's batched SMT)."""
    from zkfranchise_tpu.utils import smt_batch

    rng = random.Random(13)
    n = 1 << 12
    entries = [(rng.randrange(1 << 160), i + 1) for i in range(n)]
    tree = smt_batch.BatchSMT(entries, max_levels=160)
    for k, v in rng.sample(entries, 8):
        sibs = tree.padded_siblings(k, 160)
        assert smt.verify_proof(tree.root, k, v, sibs)


def test_bytes_to_arbo_golden():
    # electionId encoding: sha256 halves, little-endian
    eid = bytes.fromhex(
        "7faeab7a7d250527d614e952ae8e446825bd1124c6def410844c7c383d1519a6")
    d = json.load(open(GOLDEN))
    e0, e1 = arbo.bytes_to_arbo(eid)
    assert [str(e0), str(e1)] == d["electionId"]

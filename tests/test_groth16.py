"""Groth16 tests: golden reference-proof verification, host e2e, pairing."""
import json
from dataclasses import asdict

import numpy as np
import pytest

from zkfranchise_tpu.ops import ec, pairing

REF = "/root/reference/artifacts/zkCensus/dev/160/"


def test_reference_proof_verifies():
    """The committed snarkjs proof verifies under our from-scratch BN254
    pairing stack — the golden cross-implementation test."""
    from zkfranchise_tpu.groth16.verify import verify_files
    assert verify_files(REF + "verification_key.json", REF + "proof.json",
                        REF + "signals.json")


def test_tampered_signals_rejected():
    from zkfranchise_tpu.groth16.verify import Proof, VerifyingKey, verify
    vk = VerifyingKey(json.load(open(REF + "verification_key.json")))
    proof = Proof(json.load(open(REF + "proof.json")))
    signals = json.load(open(REF + "signals.json"))
    assert verify(vk, proof, signals)
    for i in range(len(signals)):
        bad = list(signals)
        bad[i] = str(int(bad[i]) + 1)
        assert not verify(vk, proof, bad), f"signal {i} tamper undetected"


def test_pairing_bilinearity():
    e1 = pairing.pairing(ec.G1_GEN, ec.G2_GEN)
    e2 = pairing.pairing(ec.g1_mul(2), ec.G2_GEN)
    e3 = pairing.pairing(ec.G1_GEN, ec.g2_mul(2))
    sq = pairing.fq12_mul(e1, e1)
    assert e2 == sq and e3 == sq
    assert e1 != pairing.fq12_one()


def test_curve_groups():
    assert ec.G1.is_on_curve(ec.G1_GEN)
    assert ec.G2.is_on_curve(ec.G2_GEN)
    # group order annihilates the generators
    assert ec.G1.mul(ec.R_ORDER, ec.G1_GEN) is None
    assert ec.G2.mul(ec.R_ORDER, ec.G2_GEN) is None


@pytest.mark.slow
def test_host_e2e_prove_verify(tmp_path):
    """Full native pipeline at nlevels=4: setup -> witness -> prove ->
    verify, plus tamper rejection incl. the unconstrained voteHash."""
    import jax
    from zkfranchise_tpu import inputs as inp
    from zkfranchise_tpu.groth16 import prove as gprove, setup as gsetup
    from zkfranchise_tpu.groth16.verify import verify
    from zkfranchise_tpu.models.census import CensusCircuit, inputs_to_limbs
    from zkfranchise_tpu.ops import lm
    import pathlib

    circ = CensusCircuit(4)
    cache = pathlib.Path("artifacts/zkCensus/dev/4/proving_key.pkl")
    if cache.exists():
        pk = gsetup.ProvingKey.load(cache)
        from zkfranchise_tpu.groth16.verify import VerifyingKey
        vk = VerifyingKey(json.load(open(cache.parent /
                                         "verification_key.json")))
    else:
        pk, vk = gsetup.dev_setup(circ.cs)
        pk.save(cache)
        json.dump(vk.to_dict(),
                  open(cache.parent / "verification_key.json", "w"))

    ci = inp.mock_inputs(4, 3, seed=42)
    w = jax.jit(circ.witness)(inputs_to_limbs(asdict(ci), 4))
    w_ints = lm.lm_to_ints(np.asarray(lm.from_mont(w, lm.FR)))
    proof = gprove.prove_host(pk, circ.cs.constraints, w_ints,
                              r=123, s=456)
    pub = w_ints[1:1 + circ.cs.num_public]
    assert verify(vk, proof, pub)
    bad = list(pub)
    bad[3] += 1  # voteHash[0] — unconstrained in-circuit, bound by QAP rows
    assert not verify(vk, proof, bad)


def test_g2_subgroup_check():
    """Generator multiples are in the subgroup; an on-twist point outside
    the r-torsion exists (large twist cofactor) and is detected."""
    assert ec.in_subgroup_g2(None)
    assert ec.in_subgroup_g2(ec.G2_GEN)
    assert ec.in_subgroup_g2(ec.g2_mul(12345))
    rogue = ec.rogue_g2_point()
    assert ec.G2.is_on_curve(rogue)
    assert not ec.in_subgroup_g2(rogue)


def test_rogue_pi_b_rejected():
    """A proof whose pi_b is on the twist but outside the r-order
    subgroup must be rejected by the verifier (parity: gnark-crypto's
    deserialization-time subgroup check, zk_census_test.go:118)."""
    from zkfranchise_tpu.groth16.verify import Proof, VerifyingKey, verify
    vk = VerifyingKey(json.load(open(REF + "verification_key.json")))
    proof = Proof(json.load(open(REF + "proof.json")))
    signals = json.load(open(REF + "signals.json"))
    assert verify(vk, proof, signals)
    proof.pi_b = ec.rogue_g2_point()
    assert not verify(vk, proof, signals)

"""Ceremony contribution protocol tests (groth16/contribute.py).

Native equivalent of the reference's snarkjs ceremony flow
(circuit-compiler.sh:52-77 phase 1, :110-127 phase 2): dev ptau -> two
contributions -> beacon -> chain verifies; a tampered link is rejected;
a proving key derived from the contributed transcript, after its own
phase-2 delta chain, still proves and verifies.
"""
import dataclasses

import pytest

from zkfranchise_tpu.groth16 import ceremony, contribute, qap
from zkfranchise_tpu.models import r1cs
from zkfranchise_tpu.ops import ec, ff

P = ff.P_FR


def _tiny_cs():
    cs = r1cs.ConstraintSystem(num_public=1)
    cs.alloc(4)          # wires 1 (public z), 2 (x), 3 (y), 4 (bit)
    cs.enforce(r1cs.lc((2, 1)), r1cs.lc((3, 1)), r1cs.lc((1, 1)))
    cs.enforce_bit(4)
    return cs


@pytest.fixture(scope="module")
def chain():
    """genesis ptau -> contribution A -> contribution B -> beacon."""
    p0 = ceremony.dev_ptau(4)
    h0 = contribute.GENESIS
    p1, c1 = contribute.phase1_contribute(p0, b"entropy-A", h0)
    p2, c2 = contribute.phase1_contribute(p1, b"entropy-B", c1.new_hash)
    p3, c3 = contribute.phase1_beacon(
        p2, "00deadbeef", c2.new_hash, n_iters=64)
    return p0, [p1, p2], p3, [c1, c2, c3]


def test_phase1_chain_verifies(chain):
    p0, mids, p3, cons = chain
    assert contribute.verify_phase1_chain(p0, p3, cons,
                                          intermediate=mids)
    # also without intermediates (final-consistency checks only)
    assert contribute.verify_phase1_chain(p0, p3, cons)


def test_phase1_tamper_rejected(chain):
    p0, mids, p3, cons = chain
    # (a) swapped contribution order breaks the hash chain
    assert not contribute.verify_phase1_chain(
        p0, p3, [cons[1], cons[0], cons[2]], intermediate=mids)
    # (b) a replayed key under a different transcript position fails PoK
    bad = dataclasses.replace(
        cons[1], keys={**cons[1].keys,
                       "tau": cons[0].keys["tau"]})
    assert not contribute.verify_phase1_chain(
        p0, p3, [cons[0], bad, cons[2]], intermediate=mids)
    # (c) a corrupted final table fails internal consistency
    p_bad = dataclasses.replace(
        p3, tau_g1=[p3.tau_g1[0], p3.tau_g1[1], p3.tau_g1[3],
                    p3.tau_g1[2]] + p3.tau_g1[4:])
    assert not contribute.verify_phase1_chain(p0, p_bad, cons,
                                              n_samples=14)
    # (d) a beacon lying about its public value is rejected
    fake = dataclasses.replace(cons[2], beacon_hex="1234")
    assert not contribute.verify_phase1_chain(
        p0, p3, [cons[0], cons[1], fake], intermediate=mids)


@pytest.mark.slow
def test_ceremony_end_to_end_proves(chain):
    """Contributed ptau -> pk derivation -> phase-2 delta chain (2
    contributions + beacon) -> chain verifies -> prove + verify."""
    from zkfranchise_tpu.groth16 import prove as gprove
    from zkfranchise_tpu.groth16 import verify as gverify

    _p0, _mids, p3, cons = chain
    cs = _tiny_cs()
    assert (1 << p3.power) >= qap.domain_size(cs.num_constraints, 1)
    pk0, vk0 = ceremony.pk_from_ptau(p3, cs)

    h0 = cons[-1].new_hash                      # phase 2 chains onto 1
    pk1, d1 = contribute.phase2_contribute(pk0, b"delta-A", h0)
    pk2, d2 = contribute.phase2_contribute(pk1, b"delta-B", d1.new_hash)
    pk3, d3 = contribute.phase2_beacon(pk2, "00cafe", d2.new_hash,
                                       n_iters=64)
    assert contribute.verify_phase2_chain(pk0, pk3, [d1, d2, d3], h0)
    # tamper: drop a link
    assert not contribute.verify_phase2_chain(pk0, pk3, [d1, d3], h0)
    # tamper: scale one C-table point
    bad_k = list(pk3.k_g1)
    bad_k[0] = ec.G1.mul(3, bad_k[0])
    pk_bad = dataclasses.replace(pk3, k_g1=bad_k)
    assert not contribute.verify_phase2_chain(pk0, pk_bad, [d1, d2, d3],
                                              h0, n_samples=len(bad_k))

    # the final key proves: delta moved, so the vk must carry the final
    # delta_g2; prove x*y = z with z public
    vk_dict = vk0.to_dict()
    vk_dict["vk_delta_2"] = [[str(pk3.delta_g2[0][0]),
                              str(pk3.delta_g2[0][1])],
                             [str(pk3.delta_g2[1][0]),
                              str(pk3.delta_g2[1][1])], ["1", "0"]]
    vk = gverify.VerifyingKey(vk_dict)
    w = [1, 21, 3, 7, 1]                        # z = x*y, bit = 1
    assert cs.check_satisfied(w) is None
    proof = gprove.prove_host(pk3, cs.constraints, w, r=123, s=456)
    assert gverify.verify(vk, proof, [21])
    assert not gverify.verify(vk, proof, [22])

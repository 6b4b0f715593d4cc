"""Census circuit tests: witness generation satisfies the native R1CS,
public-signal ordering matches the reference, negative paths fail."""
import json
from dataclasses import asdict

import jax
import numpy as np
import pytest

from zkfranchise_tpu import inputs as inp
from zkfranchise_tpu.models.census import CensusCircuit, inputs_to_limbs
from zkfranchise_tpu.ops import lm

GOLDEN = "/root/reference/artifacts/zkCensus/dev/160/inputs_example.json"


def witness_ints(circ, w, voter=0):
    """(num_vars, 21, T) Montgomery witness -> plain ints for one voter."""
    plain = lm.from_mont(w[..., voter:voter + 1], lm.FR)
    return lm.lm_to_ints(np.asarray(plain))


@pytest.fixture(scope="module")
def circ4():
    return CensusCircuit(4)


@pytest.fixture(scope="module")
def witness4(circ4):
    ci = inp.mock_inputs(4, 3, seed=42)
    arrs = inputs_to_limbs(asdict(ci), 4)
    w = jax.jit(circ4.witness)(arrs)
    return ci, w


def test_witness_satisfies_r1cs(circ4, witness4):
    _, w = witness4
    assert circ4.cs.check_satisfied(witness_ints(circ4, w)) is None


def test_public_signal_order(circ4, witness4):
    ci, w = witness4
    pub = [str(x) for x in lm.lm_to_ints(
        np.asarray(circ4.public_signals(w)))]
    # reference order (signals.json): eid0, eid1, nullifier, voteHash0,
    # voteHash1, sikRoot, censusRoot, voteWeight
    assert pub == [ci.electionId[0], ci.electionId[1], ci.nullifier,
                   ci.voteHash[0], ci.voteHash[1], ci.sikRoot,
                   ci.censusRoot, ci.voteWeight]


def test_batched_witness(circ4):
    batch = inp.mock_batch(4, 2, seed=1)
    arrs = inp.batch_to_arrays(batch, 4)
    w = jax.jit(circ4.witness)(arrs)
    assert w.shape[-1] == 2
    for i in range(2):
        assert circ4.cs.check_satisfied(witness_ints(circ4, w, i)) is None


def test_overweight_vote_violates_r1cs(circ4):
    ci = inp.mock_inputs(4, 3, seed=42, vote_weight=11)  # > availableWeight
    arrs = inputs_to_limbs(asdict(ci), 4)
    w = jax.jit(circ4.witness)(arrs)
    assert circ4.cs.check_satisfied(witness_ints(circ4, w)) is not None


def test_wrong_nullifier_violates_r1cs(circ4):
    ci = inp.mock_inputs(4, 3, seed=42)
    d = asdict(ci)
    d["nullifier"] = str(int(d["nullifier"]) + 1)
    w = jax.jit(circ4.witness)(inputs_to_limbs(d, 4))
    assert circ4.cs.check_satisfied(witness_ints(circ4, w)) is not None


def test_nonmember_violates_r1cs(circ4):
    ci = inp.mock_inputs(4, 3, seed=42)
    d = asdict(ci)
    d["censusRoot"] = str(int(d["censusRoot"]) ^ 1)
    w = jax.jit(circ4.witness)(inputs_to_limbs(d, 4))
    assert circ4.cs.check_satisfied(witness_ints(circ4, w)) is not None


@pytest.mark.slow
def test_golden_inputs_satisfy_nlevels160_circuit():
    """The reference's committed inputs_example.json satisfies our native
    constraint system at nlevels=160 — the cross-implementation parity
    anchor for the whole circuit layer."""
    circ = CensusCircuit(160)
    d = json.load(open(GOLDEN))
    arrs = inputs_to_limbs(d, 160)
    w = jax.jit(circ.witness)(arrs)
    assert circ.cs.check_satisfied(witness_ints(circ, w)) is None
    pub = [str(x) for x in lm.lm_to_ints(
        np.asarray(circ.public_signals(w)))]
    ref_signals = json.load(
        open(GOLDEN.replace("inputs_example", "signals")))
    assert pub == ref_signals

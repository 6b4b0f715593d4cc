"""Per-gadget adversarial witness-mutation tests (SURVEY §7 step-5
fallback (b)): corrupt each gadget's witness block and assert a
constraint OF THAT GADGET fails.  This is the committed alternative to
the wasm witness-diff oracle (no wasm runtime in this image): R1CS
satisfaction + golden public signals lock the honest path, and these
mutations prove each gadget's rows actually constrain their block
(a vacuous gadget would accept the mutation).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from zkfranchise_tpu import inputs as inp
from zkfranchise_tpu.models.census import CensusCircuit, N_PUBLIC
from zkfranchise_tpu.ops import ff, lm
from zkfranchise_tpu.ops.lm import FR

NL = 4
P = ff.P_FR


@pytest.fixture(scope="module")
def circuit():
    return CensusCircuit(NL)


@pytest.fixture(scope="module")
def honest_witness(circuit):
    batch = inp.mock_batch(NL, 1, seed=21)
    arrs = inp.batch_to_arrays(batch, NL)
    w_mont = circuit.witness(arrs)
    w_ints = lm.lm_to_ints(np.asarray(lm.from_mont(w_mont, FR)))
    # element-major flatten: index i*T + t with T=1 -> wire order
    assert len(w_ints) == circuit.cs.num_vars
    assert circuit.cs.check_satisfied(w_ints) is None
    return w_ints


GADGETS = ["weight", "addr_bits", "addr_strict", "sik_poseidon",
           "sik_tree", "census_tree", "nullifier"]


@pytest.mark.parametrize("gadget", GADGETS)
def test_gadget_block_is_constrained(circuit, honest_witness, gadget):
    """Flipping a value inside a gadget's allocated block must violate a
    row in that gadget's own row range."""
    cs = circuit.cs
    info = cs.gadget_rows[gadget]
    v0, v1 = info["vars"]
    r0, r1 = info["rows"]
    assert v1 > v0, gadget
    import random
    rng = random.Random(gadget)
    failures = 0
    for _ in range(3):
        w = list(honest_witness)
        idx = rng.randrange(v0, v1)
        w[idx] = (w[idx] + 1 + rng.randrange(P - 2)) % P
        bad = cs.check_satisfied(w)
        assert bad is not None, (gadget, idx, "mutation accepted!")
        if r0 <= bad < r1:
            failures += 1
    # at least one mutation must be caught by the gadget's own rows
    # (a mutated shared signal may first break an earlier gadget's row)
    assert failures >= 1, (gadget, "no failure landed in gadget rows")


def test_public_signal_tamper_rejected(circuit, honest_witness):
    """Each public signal is bound: changing it breaks satisfaction (via
    the gadget rows that reference it) or changes the claimed publics."""
    cs = circuit.cs
    # nullifier (public idx 3 -> wire 3): constrained by the nullifier rows
    w = list(honest_witness)
    w[3] = (w[3] + 1) % P
    assert cs.check_satisfied(w) is not None
    # census root (wire 7)
    w = list(honest_witness)
    w[7] = (w[7] + 1) % P
    assert cs.check_satisfied(w) is not None
    # voteWeight (wire 8): raising it above availableWeight must fail.
    # (honest vw=5, aw=10; vw=11 overflows the weight check)
    w = list(honest_witness)
    w[8] = 11
    assert cs.check_satisfied(w) is not None


def test_votehash_is_unconstrained_like_reference(circuit, honest_witness):
    """voteHash is deliberately unconstrained in the circuit
    (/root/reference/circuit/census.circom:54-57) — it is bound to the
    proof only through the public-input pairing term.  Changing it must
    NOT violate any R1CS row (parity with the reference's semantics)."""
    cs = circuit.cs
    w = list(honest_witness)
    w[4] = (w[4] + 12345) % P
    w[5] = (w[5] + 54321) % P
    assert cs.check_satisfied(w) is None

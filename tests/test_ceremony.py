"""ptau -> proving-key derivation (groth16/ceremony.py).

Oracle strategy: the dev ptau is generated from the SAME toxic-waste
derivation as setup.dev_setup, so the ceremony-derived key (which never
touches tau/alpha/beta — only the ptau point tables) must be
point-for-point equal to the directly-computed dev key; a host prove +
verify round-trip under the derived key closes the loop.  Reference
counterpart: snarkjs prepare-phase2 + groth16 setup
(/root/reference/circuit/circuit-compiler.sh:52-136).
"""
import pytest

from zkfranchise_tpu.groth16 import ceremony, poly, qap
from zkfranchise_tpu.ops import ec, ff
from zkfranchise_tpu.utils import native

P = ff.P_FR


def test_ec_lagrange_matches_scalar_oracle():
    n = 16
    tau = 98765432123456789
    powers = native.g1_fixed_base_mul([pow(tau, i, P) for i in range(n)])
    lag = ceremony.ec_lagrange_g1(powers)
    want = native.g1_fixed_base_mul(poly.lagrange_evals_at(tau, n))
    assert lag == want
    powers2 = native.g2_fixed_base_mul([pow(tau, i, P) for i in range(n)])
    assert ceremony.ec_lagrange_g2(powers2) == \
        native.g2_fixed_base_mul(poly.lagrange_evals_at(tau, n))


@pytest.mark.slow
def test_ptau_derived_key_matches_dev_setup_and_proves():
    """Small synthetic R1CS end-to-end: ptau file bytes -> parsed ->
    derived pk/vk == dev_setup pk/vk; host prove+verify under it."""
    from zkfranchise_tpu.groth16 import prove as gprove
    from zkfranchise_tpu.groth16 import setup as gsetup
    from zkfranchise_tpu.groth16 import verify as gverify
    from zkfranchise_tpu.models import r1cs
    from zkfranchise_tpu.utils import serialize

    # x * y = z (public z), plus a bit constraint to get a private wire mix
    cs = r1cs.ConstraintSystem(num_public=1)
    cs.alloc(4)          # wires 1 (public z), 2 (x), 3 (y), 4 (bit)
    cs.enforce(r1cs.lc((2, 1)), r1cs.lc((3, 1)), r1cs.lc((1, 1)))
    cs.enforce_bit(4)
    n = qap.domain_size(cs.num_constraints, cs.num_public)

    ptau = ceremony.dev_ptau(max(3, n.bit_length() - 1))
    # round-trip the container format on the way in
    ptau = serialize.read_ptau(serialize.write_ptau(ptau))

    pk, vk = ceremony.pk_from_ptau(ptau, cs)
    pk2, vk2 = gsetup.dev_setup(cs)
    assert (pk.alpha_g1, pk.beta_g1, pk.beta_g2) == \
        (pk2.alpha_g1, pk2.beta_g1, pk2.beta_g2)
    assert (pk.delta_g1, pk.delta_g2) == (pk2.delta_g1, pk2.delta_g2)
    assert pk.a_g1 == pk2.a_g1
    assert pk.b_g1 == pk2.b_g1 and pk.b_g2 == pk2.b_g2
    assert pk.k_g1 == pk2.k_g1
    assert pk.h_g1 == pk2.h_g1
    assert vk.to_dict() == vk2.to_dict()

    # witness: 6 * 7 = 42, bit = 1
    w = [1, 42, 6, 7, 1]
    assert cs.check_satisfied(w) is None
    proof = gprove.prove_host(pk, cs.constraints, w, r=11, s=13)
    assert gverify.verify(vk, proof, [42])
    assert not gverify.verify(vk, proof, [43])

    # zkey-verify equivalents: full re-derivation + pairing self-checks
    assert ceremony.verify_pk(pk, cs, ptau=ptau)
    assert ceremony.verify_pk(pk, cs)            # pairing-only mode
    bad = gsetup.ProvingKey(**{**pk.__dict__})
    bad.beta_g1 = ec.g1_mul(999)
    assert not ceremony.verify_pk(bad, cs)
    assert not ceremony.verify_pk(bad, cs, ptau=ptau)

"""Golden tests for limb-major EC ops (ops/ec_lm.py) vs the host oracle."""
import numpy as np
import jax.numpy as jnp

from zkfranchise_tpu.ops import ec, ec_lm, ff

RNG = np.random.default_rng(7)


def rand_g1(n):
    return [ec.g1_mul(int.from_bytes(RNG.bytes(16), "big") + 1)
            for _ in range(n)]


def rand_g2(n):
    return [ec.g2_mul(int.from_bytes(RNG.bytes(16), "big") + 1)
            for _ in range(n)]


def test_padd_g1_matches_host():
    ps = rand_g1(8)
    qs = rand_g1(8)
    a = jnp.asarray(ec_lm.g1_table(ps).T)        # (63, 8)
    b = jnp.asarray(ec_lm.g1_table(qs).T)
    out = ec_lm.padd_g1(a, b)
    got = ec_lm.g1_plane_to_affine(out)
    want = [ec.G1.add(p, q) for p, q in zip(ps, qs)]
    assert got == want


def test_padd_g1_complete_cases():
    p = rand_g1(1)[0]
    cases = [
        (p, p, ec.G1.double(p)),                  # doubling
        (p, None, p),                             # p + O
        (None, p, p),                             # O + p
        (None, None, None),                       # O + O
        (p, ec.G1.neg(p), None),                  # p + (-p)
    ]
    a = jnp.asarray(ec_lm.g1_table([c[0] for c in cases]).T)
    b = jnp.asarray(ec_lm.g1_table([c[1] for c in cases]).T)
    got = ec_lm.g1_plane_to_affine(ec_lm.padd_g1(a, b))
    assert got == [c[2] for c in cases]


def test_padd_g1_chain():
    """Repeated additions keep limb bounds closed (value/limb discipline)."""
    ps = rand_g1(4)
    acc_plane = jnp.asarray(ec_lm.g1_table([ps[0]]).T)
    acc_host = ps[0]
    for q in ps[1:] * 8:
        acc_plane = ec_lm.padd_g1(acc_plane,
                                  jnp.asarray(ec_lm.g1_table([q]).T))
        acc_host = ec.G1.add(acc_host, q)
        plane = np.asarray(acc_plane)
        assert plane.max() < (1 << 14), plane.max()
    assert ec_lm.g1_plane_to_affine(acc_plane) == [acc_host]


def test_padd_g2_matches_host():
    ps = rand_g2(4)
    qs = rand_g2(4)
    a = jnp.asarray(ec_lm.g2_table(ps).T)        # (126, 4)
    b = jnp.asarray(ec_lm.g2_table(qs).T)
    got = ec_lm.g2_plane_to_affine(ec_lm.padd_g2(a, b))
    want = [ec.G2.add(p, q) for p, q in zip(ps, qs)]
    assert got == want


def test_padd_g2_complete_cases():
    p = rand_g2(1)[0]
    cases = [(p, p, ec.G2.double(p)), (p, None, p), (None, p, p),
             (None, None, None), (p, ec.G2.neg(p), None)]
    a = jnp.asarray(ec_lm.g2_table([c[0] for c in cases]).T)
    b = jnp.asarray(ec_lm.g2_table([c[1] for c in cases]).T)
    got = ec_lm.g2_plane_to_affine(ec_lm.padd_g2(a, b))
    assert got == [c[2] for c in cases]


def test_padd_aa_g1_matches_host():
    """Mixed affine+affine -> projective (MSM upsweep level 0)."""
    from zkfranchise_tpu.ops import ec_affine
    ps = rand_g1(8)
    qs = rand_g1(8)
    a = jnp.asarray(ec_affine.g1_affine_table(ps).T)     # (43, 8)
    b = jnp.asarray(ec_affine.g1_affine_table(qs).T)
    got = ec_lm.g1_plane_to_affine(ec_lm.padd_aa(a, b, "g1"))
    assert got == [ec.G1.add(p, q) for p, q in zip(ps, qs)]


def test_padd_aa_complete_cases():
    from zkfranchise_tpu.ops import ec_affine
    p = rand_g1(1)[0]
    cases = [
        (p, p, ec.G1.double(p)),
        (p, None, p),
        (None, p, p),
        (None, None, None),
        (p, ec.G1.neg(p), None),
    ]
    a = jnp.asarray(ec_affine.g1_affine_table([c[0] for c in cases]).T)
    b = jnp.asarray(ec_affine.g1_affine_table([c[1] for c in cases]).T)
    got = ec_lm.g1_plane_to_affine(ec_lm.padd_aa(a, b, "g1"))
    assert got == [c[2] for c in cases]
    # g2 too
    p2 = rand_g2(1)[0]
    cases2 = [(p2, p2, ec.G2.double(p2)), (p2, None, p2), (None, p2, p2),
              (None, None, None),
              (p2, ec.G2.neg(p2), None)]
    a2 = jnp.asarray(ec_affine.g2_affine_table([c[0] for c in cases2]).T)
    b2 = jnp.asarray(ec_affine.g2_affine_table([c[1] for c in cases2]).T)
    got2 = ec_lm.g2_plane_to_affine(ec_lm.padd_aa(a2, b2, "g2"))
    assert got2 == [c[2] for c in cases2]


def test_padd_aa_g2_matches_host():
    from zkfranchise_tpu.ops import ec_affine
    ps = rand_g2(4)
    qs = rand_g2(4)
    a = jnp.asarray(ec_affine.g2_affine_table(ps).T)
    b = jnp.asarray(ec_affine.g2_affine_table(qs).T)
    got = ec_lm.g2_plane_to_affine(ec_lm.padd_aa(a, b, "g2"))
    assert got == [ec.G2.add(p, q) for p, q in zip(ps, qs)]


def test_fold_padd_aa_matches_padd():
    """fold_padd_aa == padd of the two halves (XLA fallback path)."""
    from zkfranchise_tpu.ops import ec_affine
    from zkfranchise_tpu.ops.pallas import lm_kernels as K
    ps = rand_g1(8)
    x = jnp.asarray(ec_affine.g1_affine_table(ps).T)[None]   # (1, 43, 8)
    out = K.fold_padd_aa(x, "g1")
    got = ec_lm.g1_plane_to_affine(out[0])
    want = [ec.G1.add(ps[i], ps[i + 4]) for i in range(4)]
    assert got == want

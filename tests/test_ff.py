"""Field-core tests: JAX limb arithmetic vs pure-Python bigint reference."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkfranchise_tpu.ops import ff, limbs


RNG = random.Random(0xBEEF)


def rand_fr(n):
    return [RNG.randrange(ff.P_FR) for _ in range(n)]


def rand_fq(n):
    return [RNG.randrange(ff.P_FQ) for _ in range(n)]


def test_limb_roundtrip():
    xs = rand_fr(32) + [0, 1, ff.P_FR - 1]
    arr = limbs.ints_to_limbs(xs)
    assert limbs.limbs_to_ints(arr) == xs


@pytest.mark.parametrize("fs,p,gen", [(limbs.FR, ff.P_FR, rand_fr),
                                      (limbs.FQ, ff.P_FQ, rand_fq)])
def test_add_sub_neg(fs, p, gen):
    n = 64
    a_int, b_int = gen(n), gen(n)
    # include edge cases
    a_int[:4] = [0, 0, p - 1, p - 1]
    b_int[:4] = [0, p - 1, p - 1, 1]
    a = jnp.asarray(limbs.ints_to_limbs(a_int))
    b = jnp.asarray(limbs.ints_to_limbs(b_int))
    s = limbs.limbs_to_ints(limbs.add(a, b, fs))
    d = limbs.limbs_to_ints(limbs.sub(a, b, fs))
    ng = limbs.limbs_to_ints(limbs.neg(a, fs))
    sc = limbs.limbs_to_ints(limbs.add_canonical(a, b, fs))
    dc = limbs.limbs_to_ints(limbs.sub_canonical(a, b, fs))
    for i in range(n):
        # lazy ops: correct residue class, value bounded
        assert s[i] % p == (a_int[i] + b_int[i]) % p, i
        assert d[i] % p == (a_int[i] - b_int[i]) % p, i
        assert ng[i] % p == (-a_int[i]) % p, i
        assert max(s[i], d[i], ng[i]) < 1 << (limbs.B_LOOSE_BITS + 2), i
        # canonical variants: exact representative
        assert sc[i] == (a_int[i] + b_int[i]) % p, i
        assert dc[i] == (a_int[i] - b_int[i]) % p, i


@pytest.mark.parametrize("fs,p,gen", [(limbs.FR, ff.P_FR, rand_fr),
                                      (limbs.FQ, ff.P_FQ, rand_fq)])
def test_mont_mul(fs, p, gen):
    n = 64
    a_int, b_int = gen(n), gen(n)
    a_int[:4] = [0, 1, p - 1, fs.r_mod_p]
    b_int[:4] = [p - 1, p - 1, p - 1, 1]
    a = jnp.asarray(limbs.ints_to_limbs(a_int))
    b = jnp.asarray(limbs.ints_to_limbs(b_int))
    out = limbs.limbs_to_ints(limbs.mont_mul(a, b, fs))
    rinv = pow(1 << limbs.R_BITS, -1, p)
    for i in range(n):
        assert out[i] % p == a_int[i] * b_int[i] * rinv % p, i
        assert out[i] < 2 * p, i  # Montgomery outputs are tight
    # lazy (amp-2) operands stay closed under multiplication
    a_lazy = jnp.asarray(limbs.ints_to_limbs(a_int[:8])) + \
        jnp.asarray(limbs.ints_to_limbs(b_int[:8]))
    out2 = limbs.limbs_to_ints(limbs.mont_mul(a_lazy, b[:8], fs))
    for i in range(8):
        assert out2[i] % p == (a_int[i] + b_int[i]) * b_int[i] * rinv % p, i


def test_mont_roundtrip():
    n = 32
    a_int = rand_fr(n)
    a = jnp.asarray(limbs.ints_to_limbs(a_int))
    am = limbs.to_mont(a, limbs.FR)
    back = limbs.limbs_to_ints(limbs.from_mont(am, limbs.FR))
    assert back == a_int
    # Montgomery-domain product round-trips to plain product
    b_int = rand_fr(n)
    bm = limbs.to_mont(jnp.asarray(limbs.ints_to_limbs(b_int)), limbs.FR)
    prod = limbs.limbs_to_ints(limbs.from_mont(limbs.mont_mul(am, bm, limbs.FR), limbs.FR))
    assert prod == [a_int[i] * b_int[i] % ff.P_FR for i in range(n)]


def test_inv():
    n = 16
    a_int = rand_fr(n)
    a_int[0] = 1
    am = limbs.to_mont(jnp.asarray(limbs.ints_to_limbs(a_int)), limbs.FR)
    iv = limbs.limbs_to_ints(limbs.from_mont(limbs.inv(am, limbs.FR), limbs.FR))
    for i in range(n):
        assert iv[i] == pow(a_int[i], -1, ff.P_FR), i  # from_mont is canonical
    # inv(0) == 0 convention
    z = jnp.zeros((1, limbs.N_LIMBS), dtype=jnp.uint32)
    assert limbs.limbs_to_ints(limbs.inv(z, limbs.FR)) == [0]


def test_jit_and_vmap_compose():
    a_int, b_int = rand_fr(8), rand_fr(8)
    a = jnp.asarray(limbs.ints_to_limbs(a_int))
    b = jnp.asarray(limbs.ints_to_limbs(b_int))
    f = jax.jit(lambda x, y: limbs.canon(
        limbs.mont_mul(limbs.add(x, y, limbs.FR), y, limbs.FR), limbs.FR))
    out = f(a, b)
    rinv = pow(1 << limbs.R_BITS, -1, ff.P_FR)
    expect = [(a_int[i] + b_int[i]) * b_int[i] * rinv % ff.P_FR for i in range(8)]
    assert limbs.limbs_to_ints(out) == expect


def test_host_reference_helpers():
    assert ff.big_to_ff(ff.P_FR) == 0
    assert ff.big_to_ff(5) == 5
    assert ff.big_to_ff(ff.P_FR + 7) == 7
    x = RNG.randrange(1, ff.P_FQ)
    assert x * ff.inv_mod(x, ff.P_FQ) % ff.P_FQ == 1
    xs = rand_fq(10) + [0]
    invs = ff.batch_inv(xs, ff.P_FQ)
    for x, ix in zip(xs, invs):
        assert (x == 0 and ix == 0) or x * ix % ff.P_FQ == 1
    r = ff.sqrt_mod(x * x % ff.P_FQ, ff.P_FQ)
    assert r is not None and r * r % ff.P_FQ == x * x % ff.P_FQ

"""Golden tests for the limb-major 21x13 field core (ops/lm.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from zkfranchise_tpu.ops import ff, lm

RNG = np.random.default_rng(42)
P = ff.P_FQ
R = 1 << lm.R_BITS


def rand_ints(n, p=P):
    return [int.from_bytes(RNG.bytes(32), "big") % p for _ in range(n)]


def test_roundtrip():
    xs = rand_ints(64)
    a = lm.ints_to_lm(xs)
    assert lm.lm_to_ints(a) == xs


def test_mont_mul_golden():
    xs, ys = rand_ints(128), rand_ints(128)
    a = jnp.asarray(lm.ints_to_lm(xs))
    b = jnp.asarray(lm.ints_to_lm(ys))
    out = lm.mont_mul(a, b, lm.FQ)
    got = lm.lm_to_ints(np.asarray(out))
    rinv = pow(R, -1, P)
    for g, x, y in zip(got, xs, ys):
        assert g % P == x * y * rinv % P
        assert g < 2 * P  # tight output bound


def test_mont_chain_and_norm_discipline():
    """Chain muls through adds/subs per the normalize rule; verify value."""
    xs, ys = rand_ints(32), rand_ints(32)
    a = jnp.asarray(lm.ints_to_lm(xs))
    b = jnp.asarray(lm.ints_to_lm(ys))
    s = lm.add_n(a, b)
    d = lm.sub_n(a, b, lm.FQ)
    m1 = lm.mont_mul(s, d, lm.FQ)           # (x+y)(x-y) R^-1
    m2 = lm.mont_mul(m1, m1, lm.FQ)
    got = lm.lm_to_ints(np.asarray(m2))
    rinv = pow(R, -1, P)
    for g, x, y in zip(got, xs, ys):
        w = (x + y) * (x - y) * rinv % P
        assert g % P == w * w * rinv % P


def test_from_mont_canonical():
    xs = rand_ints(64)
    r2 = [x * R % P for x in xs]
    a = jnp.asarray(lm.ints_to_lm(r2))
    out = lm.from_mont(a, lm.FQ)
    got = lm.lm_to_ints(np.asarray(out))
    assert got == xs  # exact canonical


def test_inv_and_batch_inv():
    xs = rand_ints(16)
    a = jnp.asarray(lm.ints_to_lm([x * R % P for x in xs]))
    iv = lm.inv(a, lm.FQ)
    got = lm.lm_to_ints(np.asarray(lm.from_mont(iv, lm.FQ)))
    for g, x in zip(got, xs):
        assert g == pow(x, P - 2, P)
    bv = lm.batch_inv_lanes(a, lm.FQ)
    gotb = lm.lm_to_ints(np.asarray(lm.from_mont(bv, lm.FQ)))
    assert gotb == got


def test_pow_bits_fr():
    xs = rand_ints(8, ff.P_FR)
    rr = 1 << lm.R_BITS
    a = jnp.asarray(lm.ints_to_lm([x * rr % ff.P_FR for x in xs]))
    out = lm.pow_bits(a, lm.FR.p_minus_2_bits, lm.FR)
    got = lm.lm_to_ints(np.asarray(lm.from_mont(out, lm.FR)))
    for g, x in zip(got, xs):
        assert g == pow(x, ff.P_FR - 2, ff.P_FR)

"""Device kernel tests: EC point ops, NTT, MSM, sparse matvec vs oracles."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkfranchise_tpu.groth16 import poly
from zkfranchise_tpu.ops import ec, ec_jax, ff, limbs
from zkfranchise_tpu.ops import msm as dmsm
from zkfranchise_tpu.ops import ntt as dntt

RNG = random.Random(77)
P = ff.P_FR
R_MONT = limbs.FR.r_mod_p


def rand_g1(n):
    return [ec.g1_mul(RNG.randrange(1, ec.R_ORDER)) for _ in range(n)]


def test_g1_add_double_neg():
    pts = rand_g1(5) + [None]
    qts = rand_g1(5) + [None]
    Pp = ec_jax.g1_from_affine_host(pts)
    Qp = ec_jax.g1_from_affine_host(qts)
    s = jax.jit(ec_jax.g1_add)(Pp, Qp)
    assert ec_jax.g1_to_affine_host(s) == [ec.G1.add(a, b)
                                           for a, b in zip(pts, qts)]
    d = jax.jit(ec_jax.g1_double)(Pp)
    assert ec_jax.g1_to_affine_host(d) == [ec.G1.double(p) for p in pts]
    ng = jax.jit(ec_jax.g1_neg)(Pp)
    assert ec_jax.g1_to_affine_host(ng) == [ec.G1.neg(p) for p in pts]


def test_g2_add():
    pts = [ec.g2_mul(RNG.randrange(1, ec.R_ORDER)) for _ in range(3)] + [None]
    qts = [ec.g2_mul(RNG.randrange(1, ec.R_ORDER)) for _ in range(3)] + [None]
    Pp = ec_jax.g2_from_affine_host(pts)
    Qp = ec_jax.g2_from_affine_host(qts)
    s = jax.jit(ec_jax.g2_add)(Pp, Qp)
    assert ec_jax.g2_to_affine_host(s) == [ec.G2.add(a, b)
                                           for a, b in zip(pts, qts)]


def test_ntt_roundtrip_and_coset():
    n = 32
    vec = [RNG.randrange(P) for _ in range(n)]
    vm = jnp.asarray(limbs.ints_to_limbs([v * R_MONT % P for v in vec]))
    out = jax.jit(dntt.ntt)(vm)
    assert limbs.limbs_to_ints(limbs.from_mont(out)) == poly.ntt(list(vec))
    back = jax.jit(lambda x: dntt.ntt(x, inverse=True))(out)
    assert limbs.limbs_to_ints(limbs.from_mont(back)) == vec
    cos = jax.jit(dntt.coset_evals_from_domain_evals)(vm)
    assert limbs.limbs_to_ints(limbs.from_mont(cos)) == \
        poly.coset_evals_from_domain_evals(list(vec))


def test_msm_g1():
    npts = 20
    pts = rand_g1(npts)
    pts[3] = None
    scalars = [RNG.randrange(P) for _ in range(npts)]
    scalars[5] = 0
    scalars[6] = 1
    P1 = ec_jax.g1_from_affine_host(pts)
    sc = jnp.asarray(limbs.ints_to_limbs(scalars))
    res = jax.jit(dmsm.msm_g1)(sc, P1)
    assert ec_jax.g1_to_affine_host(res)[0] == ec.msm_host(scalars, pts)
    # batched
    sc2 = jnp.stack([sc, sc], axis=0)
    res2 = jax.jit(dmsm.msm_g1)(sc2, P1)
    exp = ec.msm_host(scalars, pts)
    assert ec_jax.g1_to_affine_host(res2) == [exp, exp]


def test_msm_g2():
    npts = 6
    pts = [ec.g2_mul(RNG.randrange(1, ec.R_ORDER)) for _ in range(npts)]
    scalars = [RNG.randrange(P) for _ in range(npts)]
    P2 = ec_jax.g2_from_affine_host(pts)
    sc = jnp.asarray(limbs.ints_to_limbs(scalars))
    res = jax.jit(dmsm.msm_g2)(sc, P2)
    assert ec_jax.g2_to_affine_host(res)[0] == \
        ec.msm_host(scalars, pts, ec.G2)


def test_scalar_mul():
    pt = rand_g1(1)[0]
    k = RNG.randrange(P)
    km = jnp.asarray(limbs.int_to_limbs(k))[None]
    res = jax.jit(ec_jax.g1_scalar_mul)(
        ec_jax.g1_from_affine_host([pt]), km)
    assert ec_jax.g1_to_affine_host(res)[0] == ec.G1.mul(k, pt)


def test_sparse_spmv():
    from zkfranchise_tpu.models import r1cs
    from zkfranchise_tpu.ops import sparse

    cs = r1cs.ConstraintSystem(num_public=1)
    a = cs.alloc(3)  # wires 1..3
    # rows: [2*w1 + 3*w2] , [w3 + 5], [sum of 200 copies of w1]
    cs.enforce(r1cs.lc((1, 2), (2, 3)), r1cs.lc_const(1), {})
    cs.enforce(r1cs.lc((3, 1), (0, 5)), r1cs.lc_const(1), {})
    cs.enforce(r1cs.lc((1, 200)), r1cs.lc_const(1), {})
    arrs = cs.export_arrays()
    w_int = [1, RNG.randrange(P), RNG.randrange(P), RNG.randrange(P)]
    w_mont = jnp.asarray(limbs.ints_to_limbs(
        [x * R_MONT % P for x in w_int]))
    rows, cols, coeffs = arrs["a"]
    out = jax.jit(lambda w: sparse.spmv(rows, cols, coeffs, 4, w))(w_mont)
    got = limbs.limbs_to_ints(limbs.from_mont(out))
    exp = [(2 * w_int[1] + 3 * w_int[2]) % P, (w_int[3] + 5) % P,
           200 * w_int[1] % P, 0]
    assert got == exp

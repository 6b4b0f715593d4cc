"""Device kernel tests on the limb-major core: NTT and sparse matvec
against the host polynomial oracle (groth16/poly.py)."""
import random

import jax
import jax.numpy as jnp
import numpy as np

from zkfranchise_tpu.groth16 import poly
from zkfranchise_tpu.ops import ff, lm
from zkfranchise_tpu.ops import ntt as dntt
from zkfranchise_tpu.ops.lm import FR

RNG = random.Random(77)
P = ff.P_FR


def _vec_to_lm(vec, T=1):
    """n ints -> (n, 21, T) plain planes (value replicated across lanes)."""
    cols = lm.ints_to_lm(vec).T[:, :, None]          # (n, 21, 1)
    return jnp.asarray(np.broadcast_to(cols, (len(vec), lm.N_LIMBS, T)))


def _lm_to_vec(a):
    """(n, 21, 1) plain canonical -> n ints."""
    return lm.lm_to_ints(np.asarray(a))


def test_ntt_roundtrip_and_coset():
    n = 32
    vec = [RNG.randrange(P) for _ in range(n)]
    vm = lm.to_mont(_vec_to_lm(vec), FR)
    out = jax.jit(dntt.ntt)(vm)
    assert _lm_to_vec(lm.from_mont(out, FR)) == poly.ntt(list(vec))
    back = jax.jit(lambda x: dntt.ntt(x, inverse=True))(out)
    assert _lm_to_vec(lm.from_mont(back, FR)) == vec
    cos = jax.jit(dntt.coset_evals_from_domain_evals)(vm)
    assert _lm_to_vec(lm.from_mont(cos, FR)) == \
        poly.coset_evals_from_domain_evals(list(vec))


def test_ntt_batched_lanes():
    """T=4 independent transforms ride the lane axis."""
    n, T = 16, 4
    cols = [[RNG.randrange(P) for _ in range(T)] for _ in range(n)]
    x = jnp.asarray(np.stack([lm.ints_to_lm(row) for row in cols]))
    out = np.asarray(lm.from_mont(jax.jit(dntt.ntt)(lm.to_mont(x, FR)), FR))
    for t in range(T):
        got = lm.lm_to_ints(out[:, :, t:t + 1])
        assert got == poly.ntt([row[t] for row in cols])


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
    w_mont = lm.to_mont(_vec_to_lm(w_int), FR)
    rows, cols, coeffs = arrs["a"]
    out = jax.jit(lambda w: sparse.spmv(rows, cols, coeffs, 4, w))(w_mont)
    got = _lm_to_vec(lm.from_mont(out, FR))
    exp = [(2 * w_int[1] + 3 * w_int[2]) % P, (w_int[3] + 5) % P,
           200 * w_int[1] % P, 0]
    assert got == exp

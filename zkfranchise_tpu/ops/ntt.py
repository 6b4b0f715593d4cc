"""Device NTT over BN254 Fr (JAX, batched, limb arithmetic).

Radix-2 Cooley-Tukey with all twiddle tables precomputed host-side in
Montgomery form.  A transform is log2(n) vectorized butterfly stages —
each stage is one reshape + one mont_mul over n/2 lanes (which is itself
a batched MXU matmul, see ops/limbs.py) — so the whole NTT is a static
pipeline XLA can fuse; no data-dependent control flow.

Used by the Groth16 prover for the quotient-polynomial coset evaluations
(the role of the iFFT/FFT inside go-rapidsnark at
/root/reference/zk_census_test.go:89; SURVEY.md §3.3 hot loop #2).
Host oracle: groth16/poly.py.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..groth16 import poly
from . import ff, limbs
from .limbs import FR, N_LIMBS

P = ff.P_FR


@functools.lru_cache(maxsize=None)
class NTTPlan:
    """Precomputed tables for a 2^log_n transform (cached per log_n)."""

    def __init__(self, log_n: int):
        self.log_n = log_n
        n = 1 << log_n
        self.n = n
        r = FR.r_mod_p
        w = poly.root_of_unity(log_n)
        winv = ff.inv_mod(w, P)

        def stage_tables(root):
            tables = []
            size = 2
            while size <= n:
                step = pow(root, n // size, P)
                half = size // 2
                tw = [pow(step, k, P) * r % P for k in range(half)]
                tables.append(limbs.ints_to_limbs(tw))
                size *= 2
            return tables

        self.fwd_tw = stage_tables(w)
        self.inv_tw = stage_tables(winv)
        self.n_inv_mont = limbs.int_to_limbs(ff.inv_mod(n, P) * r % P)
        # bit-reversal permutation
        br = np.zeros(n, dtype=np.int32)
        for i in range(n):
            br[i] = int(bin(i)[2:].zfill(log_n)[::-1], 2)
        self.bitrev = br
        # coset shift powers s^i and their inverses (Montgomery form)
        s = poly.COSET_SHIFT
        sinv = ff.inv_mod(s, P)
        self.shift_pows = limbs.ints_to_limbs(
            [pow(s, i, P) * r % P for i in range(n)])
        self.shift_inv_pows = limbs.ints_to_limbs(
            [pow(sinv, i, P) * r % P for i in range(n)])


def _transform(x: jnp.ndarray, tables, plan: NTTPlan) -> jnp.ndarray:
    """x: (..., n, 16) Montgomery form, natural order in/out."""
    n = plan.n
    x = x[..., plan.bitrev, :]
    for s, tw in enumerate(tables):
        size = 2 << s
        half = size // 2
        v = x.reshape(*x.shape[:-2], n // size, 2, half, N_LIMBS)
        lo = v[..., 0, :, :]
        hi = limbs.mont_mul(v[..., 1, :, :], jnp.asarray(tw), FR)
        out_lo = limbs.add(lo, hi, FR)
        out_hi = limbs.sub(lo, hi, FR, b_amp=1)
        # keep limb amplitude ~1 across stages (weak rounds are cheap)
        x = limbs.weak_normalize(
            jnp.stack([out_lo, out_hi], axis=-3), 1).reshape(
            *x.shape[:-2], n, N_LIMBS)
    return x


def ntt(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Forward/inverse NTT on (..., n, 16) Montgomery-form arrays."""
    n = x.shape[-2]
    plan = NTTPlan(n.bit_length() - 1)
    assert plan.n == n
    if not inverse:
        return _transform(x, plan.fwd_tw, plan)
    y = _transform(x, plan.inv_tw, plan)
    return limbs.mont_mul(y, jnp.asarray(plan.n_inv_mont), FR)


def coset_evals_from_domain_evals(x: jnp.ndarray) -> jnp.ndarray:
    """Domain evals of a deg<n polynomial -> evals on the coset s*w^j.
    Device equivalent of groth16.poly.coset_evals_from_domain_evals."""
    n = x.shape[-2]
    plan = NTTPlan(n.bit_length() - 1)
    coefs = ntt(x, inverse=True)
    shifted = limbs.mont_mul(coefs, jnp.asarray(plan.shift_pows), FR)
    return ntt(shifted)

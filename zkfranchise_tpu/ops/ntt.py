"""Device NTT over BN254 Fr (limb-major core, element-major layout).

Arrays are ``(n, 21, T)``: the transform length n rides the MAJOR axis
(cheap row gathers), limbs ride sublanes, and T independent transforms
(the voter batch) ride the 128-wide lanes — every butterfly multiply runs
at full lane utilization regardless of n.

Radix-2 Cooley-Tukey, decimation in time.  All data movement is static:
per stage one row gather whose indices are precomputed host-side with the
stage-(s-1) inverse permutation COMPOSED in (so no scatters, and the
initial bit-reversal is free — it folds into the first stage's gather).
The butterfly itself is one mont_mul over n/2 rows + a lazy add and a
spread-constant subtract; element VALUES grow by < 2^257 per stage, which
stays far inside the 21x13 core's ~2^265 Montgomery operand budget for
any practical log2(n) (< 40 stages).

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
from . import ff, lm
from .lm import FR
from .pallas import lm_kernels as K

P = ff.P_FR


def _bitrev(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    br = np.zeros(n, dtype=np.int64)
    for i in range(n):
        br[i] = int(bin(i)[2:].zfill(log_n)[::-1] or "0", 2)
    return br


def _col(x: int) -> np.ndarray:
    return lm.int_to_limbs(x)[:, None].astype(np.int32)


@functools.lru_cache(maxsize=None)
class NTTPlan:
    """Precomputed gathers + twiddle tables for a 2^log_n transform.

    For each stage s the DIT schedule pairs work-indices
    (b*size + j, b*size + half + j); `gather[s]` maps those (lo then hi,
    concatenated) to physical row positions of the PREVIOUS stage's
    output, so each stage is exactly one gather.  `final` restores
    natural order after the last stage."""

    def __init__(self, log_n: int):
        self.log_n = log_n
        n = 1 << log_n
        self.n = n
        r = FR.r_mod_p
        w = poly.root_of_unity(log_n)
        winv = ff.inv_mod(w, P)

        def schedule(root):
            gathers, tws = [], []
            pos = _bitrev(n)          # pos[w] = physical slot of work idx w
            for s in range(log_n):
                size = 2 << s
                half = size // 2
                blocks = n // size
                j = np.tile(np.arange(half, dtype=np.int64), blocks)
                base = np.repeat(np.arange(blocks, dtype=np.int64) * size,
                                 half)
                lo_w = base + j
                hi_w = lo_w + half
                gathers.append(np.concatenate(
                    [pos[lo_w], pos[hi_w]]).astype(np.int32))
                # twiddle rows for the concatenated hi half (tiled over b)
                step = pow(root, n // size, P)
                tw = np.asarray(lm.ints_to_lm(
                    [pow(step, int(k), P) * r % P for k in range(half)]),
                    np.int32).T[:, :, None]              # (half, 21, 1)
                tws.append(np.tile(tw, (blocks, 1, 1)))
                new_pos = np.empty(n, dtype=np.int64)
                new_pos[lo_w] = np.arange(half * blocks)
                new_pos[hi_w] = half * blocks + np.arange(half * blocks)
                pos = new_pos
            return gathers, tws, pos.astype(np.int32)

        self.fwd_g, self.fwd_tw, self.fwd_final = schedule(w)
        self.inv_g, self.inv_tw, self.inv_final = schedule(winv)
        self.n_inv_mont = _col(ff.inv_mod(n, P) * r % P)
        s = poly.COSET_SHIFT
        sinv = ff.inv_mod(s, P)
        self.shift_pows = np.asarray(lm.ints_to_lm(
            [pow(s, i, P) * r % P for i in range(n)]),
            np.int32).T[:, :, None]                      # (n, 21, 1)
        self.shift_inv_pows = np.asarray(lm.ints_to_lm(
            [pow(sinv, i, P) * r % P for i in range(n)]),
            np.int32).T[:, :, None]


def _transform(x: jnp.ndarray, gathers, tws, final) -> jnp.ndarray:
    """x: (n, 21, T) Montgomery form, natural order in/out."""
    n = x.shape[0]
    h = n // 2
    for g, tw in zip(gathers, tws):
        paired = x[jnp.asarray(g)]
        lo, hi = paired[:h], paired[h:]
        hi = K.mont_mul(hi, jnp.asarray(tw), FR)
        out_lo = lm.weak_norm(lo + hi)
        out_hi = lm.sub_n(lo, hi, FR)
        x = jnp.concatenate([out_lo, out_hi], axis=0)
    return x[jnp.asarray(final)]


def ntt(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Forward/inverse NTT on (n, 21, T) Montgomery-form arrays."""
    n = x.shape[0]
    plan = NTTPlan(n.bit_length() - 1)
    assert plan.n == n
    if not inverse:
        return _transform(x, plan.fwd_g, plan.fwd_tw, plan.fwd_final)
    y = _transform(x, plan.inv_g, plan.inv_tw, plan.inv_final)
    return K.mont_mul(y, jnp.asarray(plan.n_inv_mont), FR)


def coset_evals_from_domain_evals(x: jnp.ndarray) -> jnp.ndarray:
    """Domain evals of a deg<n polynomial -> evals on the coset s*w^j.
    Device equivalent of groth16.poly.coset_evals_from_domain_evals."""
    n = x.shape[0]
    plan = NTTPlan(n.bit_length() - 1)
    coefs = ntt(x, inverse=True)
    shifted = K.mont_mul(coefs, jnp.asarray(plan.shift_pows), FR)
    return ntt(shifted)

"""Vectorized Poseidon permutation over BN254 Fr (limb-major core).

Element layout follows ops/lm.py: a field element is an int32 plane
``(..., 21, T)`` — limbs on sublanes, T independent elements on lanes.  A
hash call takes ``(..., k, 21, T)`` (k inputs stacked on a leading axis)
and returns ``(..., 21, T)``; the round loop is a ``lax.scan`` so the
traced program stays small, and every round is pure lane-parallel limb
arithmetic (full 128-lane utilization for T >= 128).

Replaces circomlib Poseidon (reference call sites:
/root/reference/circuit/census.circom:74,105 and circomlibjs usage at
/root/reference/ts_inputs/src/inputs.ts:16-36, arbo tree hashing at
/root/reference/internal/helpers.go:48).  Constants come from
poseidon_constants.py (Grain-LFSR regenerated) and are golden-tested
against the reference artifacts.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ff, lm
from .lm import FR
from .poseidon_constants import N_ROUNDS_F, N_ROUNDS_P, constants


@functools.lru_cache(maxsize=None)
def _tables(t: int):
    """Round-constant and MDS tables in Montgomery limb-major form:
    c_mont (rounds, t, 21, 1), m_mont (t, t, 21, 1)."""
    c, m = constants(t)
    r = FR.r_mod_p
    p = ff.P_FR
    n_rounds = N_ROUNDS_F + N_ROUNDS_P[t - 2]
    c_mont = np.stack(
        [lm.ints_to_lm([c[ri * t + i] * r % p for i in range(t)]).T
         for ri in range(n_rounds)], axis=0)[..., None]  # (rounds, t, 21, 1)
    m_mont = np.stack(
        [lm.ints_to_lm([m[i][j] * r % p for j in range(t)]).T
         for i in range(t)], axis=0)[..., None]          # (t, t, 21, 1)
    return c_mont.astype(np.int32), m_mont.astype(np.int32)


def _sbox(x: jnp.ndarray) -> jnp.ndarray:
    x2 = lm.mont_mul(x, x, FR)
    x4 = lm.mont_mul(x2, x2, FR)
    return lm.mont_mul(x4, x, FR)


def _mix(state: jnp.ndarray, m_mont: jnp.ndarray) -> jnp.ndarray:
    """state: (..., t, 21, T); m_mont: (t, t, 21, 1).
    new[i] = sum_j M[i][j] * s[j] — the lazy sum reaches t*(2^13+eps) per
    limb (t <= 5, well inside int32); one weak round re-normalizes."""
    t = m_mont.shape[0]
    prods = lm.mont_mul(m_mont, state[..., None, :, :, :], FR)
    return lm.weak_norm(jnp.sum(prods, axis=-3))


def permutation(state: jnp.ndarray, t: int) -> jnp.ndarray:
    """Full Poseidon permutation on state (..., t, 21, T), Montgomery."""
    c_mont, m_mont = _tables(t)
    c_arr = jnp.asarray(c_mont)
    m_arr = jnp.asarray(m_mont)
    r_f, r_p = N_ROUNDS_F, N_ROUNDS_P[t - 2]
    half = r_f // 2

    def full_round(st, c_r):
        st = _sbox(lm.weak_norm(st + c_r))
        return _mix(st, m_arr), None

    def partial_round(st, c_r):
        st = lm.weak_norm(st + c_r)
        s0 = _sbox(st[..., 0:1, :, :])
        st = jnp.concatenate([s0, st[..., 1:, :, :]], axis=-3)
        return _mix(st, m_arr), None

    state, _ = jax.lax.scan(full_round, state, c_arr[:half])
    state, _ = jax.lax.scan(partial_round, state, c_arr[half:half + r_p])
    state, _ = jax.lax.scan(full_round, state, c_arr[half + r_p:])
    return state


def poseidon_mont(inputs: jnp.ndarray) -> jnp.ndarray:
    """Poseidon hash of k field elements: inputs (..., k, 21, T) Montgomery
    form -> (..., 21, T) Montgomery form.  k is static (1..16)."""
    k = inputs.shape[-3]
    t = k + 1
    zero = jnp.zeros((*inputs.shape[:-3], 1, lm.N_LIMBS, inputs.shape[-1]),
                     dtype=jnp.int32)
    state = jnp.concatenate([zero, inputs], axis=-3)
    out = permutation(state, t)
    return out[..., 0, :, :]


def poseidon2_mont(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """H(a, b) — SMT intermediate-node hash (arity 2)."""
    return poseidon_mont(jnp.stack([a, b], axis=-3))


def poseidon3_mont(a, b, c) -> jnp.ndarray:
    """H(a, b, c) — SIK hash / SMT leaf hash (arity 3)."""
    return poseidon_mont(jnp.stack([a, b, c], axis=-3))


def poseidon4_mont(a, b, c, d) -> jnp.ndarray:
    """H(a, b, c, d) — nullifier hash (arity 4)."""
    return poseidon_mont(jnp.stack([a, b, c, d], axis=-3))

"""Vectorized Poseidon permutation over BN254 Fr (JAX, limb arithmetic).

Batch-first TPU design: a call hashes a whole batch of inputs at once —
shape (..., k, 16) Montgomery-form limb arrays — with the round loop
expressed as `lax.scan` so the traced program stays small and XLA can
pipeline the limb arithmetic across the batch dimension.

Replaces circomlib Poseidon (reference call sites:
/root/reference/circuit/census.circom:74,105 and circomlibjs usage at
/root/reference/ts_inputs/src/inputs.ts:16-36, arbo tree hashing at
/root/reference/internal/helpers.go:48).  Constants come from
poseidon_constants.py and are golden-tested against the reference
artifacts.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ff, limbs
from .limbs import FR
from .poseidon_constants import N_ROUNDS_F, N_ROUNDS_P, constants


@functools.lru_cache(maxsize=None)
def _tables(t: int):
    """Round-constant and MDS tables in Montgomery limb form (numpy)."""
    c, m = constants(t)
    r = FR.r_mod_p
    p = ff.P_FR
    n_rounds = N_ROUNDS_F + N_ROUNDS_P[t - 2]
    c_mont = np.array(
        [[limbs.int_to_limbs(c[ri * t + i] * r % p) for i in range(t)]
         for ri in range(n_rounds)], dtype=np.uint32)  # (rounds, t, 16)
    m_mont = np.array(
        [[limbs.int_to_limbs(m[i][j] * r % p) for j in range(t)]
         for i in range(t)], dtype=np.uint32)          # (t, t, 16)
    return c_mont, m_mont


def _sbox(x: jnp.ndarray) -> jnp.ndarray:
    x2 = limbs.mont_mul(x, x, FR)
    x4 = limbs.mont_mul(x2, x2, FR)
    return limbs.mont_mul(x4, x, FR)


def _mix(state: jnp.ndarray, m_mont: jnp.ndarray) -> jnp.ndarray:
    """state: (..., t, L); m_mont: (t, t, L). new[i] = sum_j M[i][j]*s[j].
    The lazy sum reaches amplitude t; one weak-normalize round restores
    amplitude 1 before the next round's ark+sbox."""
    t = m_mont.shape[0]
    prods = limbs.mont_mul(m_mont, state[..., None, :, :], FR)  # (..., t, t, L)
    acc = prods[..., 0, :]
    for j in range(1, t):
        acc = limbs.add(acc, prods[..., j, :], FR)
    return limbs.weak_normalize(acc, 1)


def permutation(state: jnp.ndarray, t: int) -> jnp.ndarray:
    """Full Poseidon permutation on state (..., t, 16), Montgomery form."""
    c_mont, m_mont = _tables(t)
    c_arr = jnp.asarray(c_mont)
    m_arr = jnp.asarray(m_mont)
    r_f, r_p = N_ROUNDS_F, N_ROUNDS_P[t - 2]
    half = r_f // 2

    def full_round(st, c_r):
        st = limbs.add(st, c_r, FR)
        st = _sbox(st)
        return _mix(st, m_arr), None

    def partial_round(st, c_r):
        st = limbs.add(st, c_r, FR)
        s0 = _sbox(st[..., 0:1, :])
        st = jnp.concatenate([s0, st[..., 1:, :]], axis=-2)
        return _mix(st, m_arr), None

    state, _ = jax.lax.scan(full_round, state, c_arr[:half])
    state, _ = jax.lax.scan(partial_round, state, c_arr[half:half + r_p])
    state, _ = jax.lax.scan(full_round, state, c_arr[half + r_p:])
    return state


def poseidon_mont(inputs: jnp.ndarray) -> jnp.ndarray:
    """Poseidon hash of k field elements: inputs (..., k, 16) Montgomery form
    -> (..., 16) Montgomery form.  k is static (1..16)."""
    k = inputs.shape[-2]
    t = k + 1
    zero = jnp.zeros((*inputs.shape[:-2], 1, limbs.N_LIMBS), dtype=jnp.uint32)
    state = jnp.concatenate([zero, inputs], axis=-2)
    out = permutation(state, t)
    return out[..., 0, :]


def poseidon2_mont(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """H(a, b) — SMT intermediate-node hash (arity 2)."""
    return poseidon_mont(jnp.stack([a, b], axis=-2))


def poseidon3_mont(a, b, c) -> jnp.ndarray:
    """H(a, b, c) — SIK hash / SMT leaf hash (arity 3)."""
    return poseidon_mont(jnp.stack([a, b, c], axis=-2))


def poseidon4_mont(a, b, c, d) -> jnp.ndarray:
    """H(a, b, c, d) — nullifier hash (arity 4)."""
    return poseidon_mont(jnp.stack([a, b, c, d], axis=-2))

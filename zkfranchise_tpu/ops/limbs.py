"""TPU-native multi-limb modular arithmetic for BN254 (JAX, vectorized).

Design: TPUs have no native 64-bit integer path worth using, so a 254-bit
field element is represented as 16 little-endian limbs of 16 bits each,
stored in uint32 lanes, shape ``(..., 16)``.  All products of two limbs fit
exactly in uint32 ((2^16-1)^2 < 2^32) and column sums stay below 2^23, so the
whole Montgomery pipeline runs in uint32 with deterministic wraparound-free
arithmetic.  Values are kept in Montgomery form (R = 2^256) on device.

Every function broadcasts over arbitrary leading batch dimensions, which is
how voter-batch data parallelism is expressed: a batch of field elements is a
``(batch, 16)`` array and `jax.vmap`/sharding applies on the leading axes.

Replaces the bigint field arithmetic the reference delegates to snarkjs
(wasm) and go-rapidsnark (Go) — see SURVEY.md §2b row "BN254 field & curve
arithmetic"; the Fr modulus constant is the one at
/root/reference/internal/helpers.go:15.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ff

N_LIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = N_LIMBS * LIMB_BITS  # Montgomery R = 2^256


def int_to_limbs(x: int) -> np.ndarray:
    """Python int -> (16,) uint32 limb array (little-endian 16-bit limbs)."""
    assert 0 <= x < (1 << R_BITS)
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(N_LIMBS)],
                    dtype=np.uint32)


def ints_to_limbs(xs) -> np.ndarray:
    """Iterable of ints -> (n, 16) uint32."""
    return np.stack([int_to_limbs(int(x)) for x in xs], axis=0)


def limbs_to_int(a) -> int:
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(a[..., i]) << (LIMB_BITS * i) for i in range(N_LIMBS))


def limbs_to_ints(a) -> list:
    """(n,16) array -> list of Python ints."""
    a = np.asarray(a)
    flat = a.reshape(-1, N_LIMBS)
    return [limbs_to_int(row) for row in flat]


class FieldSpec(NamedTuple):
    """Static per-field constants (baked into traced programs)."""
    p: int                 # modulus as Python int
    p_limbs: np.ndarray    # (16,) uint32
    n0: int                # -p^{-1} mod 2^16
    r_mod_p: int           # R mod p
    r2_limbs: np.ndarray   # R^2 mod p, plain limbs (for to_mont)
    one_mont: np.ndarray   # R mod p (Montgomery form of 1)
    p_minus_2_bits: np.ndarray  # (254,) uint32 bits of p-2, LSB first (for inv)


@functools.lru_cache(maxsize=None)
def make_field(p: int) -> FieldSpec:
    r = 1 << R_BITS
    n0 = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    r_mod_p = r % p
    r2 = (r * r) % p
    nbits = p.bit_length()
    e = p - 2
    bits = np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32)
    return FieldSpec(
        p=p,
        p_limbs=int_to_limbs(p),
        n0=n0,
        r_mod_p=r_mod_p,
        r2_limbs=int_to_limbs(r2),
        one_mont=int_to_limbs(r_mod_p),
        p_minus_2_bits=bits,
    )


FR = make_field(ff.P_FR)
FQ = make_field(ff.P_FQ)


# ---------------------------------------------------------------------------
# basic limb helpers
# ---------------------------------------------------------------------------

def zeros_like_batch(shape_prefix) -> jnp.ndarray:
    return jnp.zeros((*shape_prefix, N_LIMBS), dtype=jnp.uint32)


def _carry_prop(t: jnp.ndarray, n: int) -> jnp.ndarray:
    """Sequentially propagate carries over the first n limb positions."""
    for k in range(n - 1):
        carry = t[..., k] >> LIMB_BITS
        t = t.at[..., k + 1].add(carry)
        t = t.at[..., k].set(t[..., k] & LIMB_MASK)
    return t


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """a - b limbwise; returns (diff, final_borrow). Inputs normalized (<2^16)."""
    out = []
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    for k in range(N_LIMBS):
        ak = a[..., k]
        bk = b[..., k] + borrow
        borrow = (ak < bk).astype(jnp.uint32)
        out.append((ak + (borrow << LIMB_BITS)) - bk)
    return jnp.stack(out, axis=-1), borrow


def _cond_sub_p(r: jnp.ndarray, fs: FieldSpec) -> jnp.ndarray:
    """If r >= p, return r - p, else r. r must be < 2p and normalized."""
    p = jnp.asarray(fs.p_limbs)
    diff, borrow = _sub_limbs(r, jnp.broadcast_to(p, r.shape))
    keep = (borrow == 1)[..., None]
    return jnp.where(keep, r, diff)


# ---------------------------------------------------------------------------
# modular add / sub / neg
# ---------------------------------------------------------------------------

def add(a: jnp.ndarray, b: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    t = a + b  # limbwise, <= 2^17 per limb
    t = _carry_prop(t, N_LIMBS)
    # top limb may hold a 17th bit; fold it into the comparison by treating
    # the value as-is: since a,b < p < 2^254, sum < 2p < 2^255 fits 16 limbs.
    return _cond_sub_p(t, fs)


def sub(a: jnp.ndarray, b: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    diff, borrow = _sub_limbs(a, b)
    # if borrowed, add p back (the mod-2^256 wrap is dropped by masking the
    # top limb after propagation: (a - b + 2^256) + p == a - b + p mod 2^256)
    t = diff + jnp.asarray(fs.p_limbs) * borrow[..., None]
    t = _carry_prop(t, N_LIMBS)
    t = t.at[..., N_LIMBS - 1].set(t[..., N_LIMBS - 1] & LIMB_MASK)
    return t


def neg(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    z = jnp.zeros_like(a)
    res = sub(z, a, fs)
    # keep -0 == 0
    nonzero = jnp.any(a != 0, axis=-1, keepdims=True)
    return jnp.where(nonzero, res, z)


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------

def mont_mul(a: jnp.ndarray, b: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Montgomery product: a*b*R^{-1} mod p.  a, b in [0, p)."""
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, (*batch, N_LIMBS))
    b = jnp.broadcast_to(b, (*batch, N_LIMBS))

    t = jnp.zeros((*batch, 2 * N_LIMBS + 1), dtype=jnp.uint32)
    # schoolbook product, columns accumulated with lo/hi splits
    for i in range(N_LIMBS):
        prod = a[..., i:i + 1] * b  # (..., 16) exact in uint32
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        t = t.at[..., i:i + N_LIMBS].add(lo)
        t = t.at[..., i + 1:i + N_LIMBS + 1].add(hi)
    # column sums <= 32 * (2^16-1) < 2^21

    p = jnp.asarray(fs.p_limbs)
    n0 = jnp.uint32(fs.n0)
    # Montgomery reduction: zero out the low 16 limbs
    for i in range(N_LIMBS):
        if i > 0:
            # fold carry out of the previous (now zero mod 2^16) position
            t = t.at[..., i].add(t[..., i - 1] >> LIMB_BITS)
        m = (t[..., i] * n0) & LIMB_MASK  # depends only on t[i] mod 2^16
        prod = m[..., None] * p
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        t = t.at[..., i:i + N_LIMBS].add(lo)
        t = t.at[..., i + 1:i + N_LIMBS + 1].add(hi)
    t = t.at[..., N_LIMBS].add(t[..., N_LIMBS - 1] >> LIMB_BITS)

    res = t[..., N_LIMBS:2 * N_LIMBS + 1]
    res = _carry_prop(res, N_LIMBS + 1)
    # total value < 2p < 2^255, so limb 16 is zero after propagation
    res = res[..., :N_LIMBS]
    return _cond_sub_p(res, fs)


def mont_sqr(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    return mont_mul(a, a, fs)


def to_mont(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    return mont_mul(a, jnp.asarray(fs.r2_limbs), fs)


def from_mont(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    one = jnp.zeros(N_LIMBS, dtype=jnp.uint32).at[0].set(1)
    return mont_mul(a, one, fs)


# ---------------------------------------------------------------------------
# exponentiation / inversion
# ---------------------------------------------------------------------------

def pow_bits(a: jnp.ndarray, bits: np.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """a^e where e is given as LSB-first bit array (static length).
    a in Montgomery form; result in Montgomery form."""
    bits_arr = jnp.asarray(bits, dtype=jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(fs.one_mont), a.shape)

    def body(i, carry):
        acc, base = carry
        bit = bits_arr[i]
        mult = mont_mul(acc, base, fs)
        acc = jnp.where((bit == 1), mult, acc)
        base = mont_mul(base, base, fs)
        return acc, base

    acc, _ = jax.lax.fori_loop(0, bits_arr.shape[0], body, (one, a))
    return acc


def inv(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Modular inverse via Fermat: a^(p-2). Montgomery in/out. inv(0) = 0."""
    return pow_bits(a, fs.p_minus_2_bits, fs)


# ---------------------------------------------------------------------------
# predicates / selection
# ---------------------------------------------------------------------------

def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """(...,) bool — true where the element is zero (any representation)."""
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond: (...,) bool; picks a where true else b."""
    return jnp.where(cond[..., None], a, b)

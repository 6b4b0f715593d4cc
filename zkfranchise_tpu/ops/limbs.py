"""TPU-native multi-limb modular arithmetic for BN254 (JAX, vectorized).

Design: TPUs have no native 64-bit integer path, so a 254-bit field element
is 16 little-endian limbs of 16 bits in uint32 lanes, shape ``(..., 16)``.
The pipeline is built from three TPU-friendly primitives:

  * limb-product accumulation as an f32 MATMUL against a constant 0/1
    column matrix (exact: all partial sums < 2^24), so the MXU — not the
    VPU — carries the multiplier throughput;
  * full-word Montgomery reduction (m = T_lo * (-p^-1 mod 2^256) mod 2^256,
    then (T + m*p) >> 256), which has NO sequential limb recurrence, unlike
    CIOS — everything is two more matmul products;
  * Kogge-Stone parallel carry/borrow resolution (log-depth flag scan)
    instead of 16-step ripple chains.

No scatters, no data-dependent control flow: every op is elementwise or a
matmul, so the whole field layer vmaps/shards cleanly over voter batches.

Values are kept in Montgomery form (R = 2^256) on device.

Replaces the bigint arithmetic the reference delegates to snarkjs (wasm)
and go-rapidsnark (Go) — SURVEY.md §2b "BN254 field & curve arithmetic";
the Fr modulus is the constant at /root/reference/internal/helpers.go:15.
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
WIDE = 2 * N_LIMBS + 1        # 33 columns for a full product


def int_to_limbs(x: int) -> np.ndarray:
    """Python int -> (16,) uint32 limb array (little-endian 16-bit limbs)."""
    assert 0 <= x < (1 << R_BITS)
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(N_LIMBS)],
                    dtype=np.uint32)


def ints_to_limbs(xs) -> np.ndarray:
    """Iterable of ints -> (n, 16) uint32."""
    return np.stack([int_to_limbs(int(x)) for x in xs], axis=0) \
        if len(xs) else np.zeros((0, N_LIMBS), np.uint32)


def limbs_to_int(a) -> int:
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(a[..., i]) << (LIMB_BITS * i) for i in range(N_LIMBS))


def limbs_to_ints(a) -> list:
    a = np.asarray(a)
    flat = a.reshape(-1, N_LIMBS)
    return [limbs_to_int(row) for row in flat]


class FieldSpec(NamedTuple):
    """Static per-field constants (baked into traced programs)."""
    p: int
    p_limbs: np.ndarray        # (16,) uint32
    p_comp_limbs: np.ndarray   # 2^256 - p, for borrow-free comparisons
    p2_comp_limbs: np.ndarray  # 2^256 - 2p
    p2_plus1_limbs: np.ndarray  # 2p + 1 (for borrow-free redundant sub)
    nprime_limbs: np.ndarray   # -p^{-1} mod 2^256
    r_mod_p: int
    r2_limbs: np.ndarray       # R^2 mod p (plain limbs)
    one_mont: np.ndarray       # R mod p
    p_minus_2_bits: np.ndarray


@functools.lru_cache(maxsize=None)
def make_field(p: int) -> FieldSpec:
    r = 1 << R_BITS
    nprime = (-pow(p, -1, r)) % r
    e = p - 2
    bits = np.array([(e >> i) & 1 for i in range(p.bit_length())],
                    dtype=np.uint32)
    return FieldSpec(
        p=p,
        p_limbs=int_to_limbs(p),
        p_comp_limbs=int_to_limbs(r - p),
        p2_comp_limbs=int_to_limbs(r - 2 * p),
        p2_plus1_limbs=int_to_limbs(2 * p + 1),
        nprime_limbs=int_to_limbs(nprime),
        r_mod_p=r % p,
        r2_limbs=int_to_limbs(r * r % p),
        one_mont=int_to_limbs(r % p),
        p_minus_2_bits=bits,
    )


FR = make_field(ff.P_FR)
FQ = make_field(ff.P_FQ)


# ---------------------------------------------------------------------------
# carry resolution (Kogge-Stone, log-depth, no ripple loops)
# ---------------------------------------------------------------------------

def _shift_right_one(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Along last axis: out[k] = x[k-1], out[0] = 0."""
    return jnp.pad(x[..., :n - 1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])


def _normalize(t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Resolve carries: t (..., W) uint32 limbs each < 2^23 ->
    (normalized limbs < 2^16, carry_out flag (...,) uint32 0/1).
    The dropped carry_out is the 2^(16W) overflow bit."""
    w = t.shape[-1]
    # two local rounds: limbs -> <= 2^16; record top-limb carry drops
    extra = jnp.zeros(t.shape[:-1], dtype=jnp.uint32)
    for _ in range(2):
        lo = t & LIMB_MASK
        hi = t >> LIMB_BITS
        extra = extra + hi[..., w - 1]
        t = lo + _shift_right_one(hi, w)
    g = t >> LIMB_BITS              # generate (0/1)
    d = t & LIMB_MASK
    p = (d == LIMB_MASK).astype(jnp.uint32)  # propagate
    # Kogge-Stone aggregation of (g, p) over prefixes
    shift = 1
    while shift < w:
        gs = jnp.pad(g[..., :w - shift],
                     [(0, 0)] * (g.ndim - 1) + [(shift, 0)])
        ps = jnp.pad(p[..., :w - shift],
                     [(0, 0)] * (p.ndim - 1) + [(shift, 0)],
                     constant_values=1)
        g = g | (p & gs)
        p = p & ps
        shift *= 2
    carry_in = _shift_right_one(g, w)
    out = (d + carry_in) & LIMB_MASK
    carry_out = g[..., w - 1] + extra
    return out, carry_out


# ---------------------------------------------------------------------------
# wide products via constant matmul
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _col_matrix() -> np.ndarray:
    """(512, 33) 0/1 f32: routes lo(i,j) -> col i+j, hi(i,j) -> col i+j+1."""
    m = np.zeros((2 * N_LIMBS * N_LIMBS, WIDE), dtype=np.float32)
    for i in range(N_LIMBS):
        for j in range(N_LIMBS):
            m[i * N_LIMBS + j, i + j] = 1.0
            m[N_LIMBS * N_LIMBS + i * N_LIMBS + j, i + j + 1] = 1.0
    return m


def _mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full product columns: a, b (..., 16) normalized -> (..., 33) uint32
    column sums (each < 2^21)."""
    prod = a[..., :, None] * b[..., None, :]           # exact in uint32
    lo = (prod & LIMB_MASK).astype(jnp.float32)
    hi = (prod >> LIMB_BITS).astype(jnp.float32)
    flat = jnp.concatenate(
        [lo.reshape(*lo.shape[:-2], N_LIMBS * N_LIMBS),
         hi.reshape(*hi.shape[:-2], N_LIMBS * N_LIMBS)], axis=-1)
    cols = jax.lax.dot_general(
        flat, jnp.asarray(_col_matrix()),
        dimension_numbers=(((flat.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return cols.astype(jnp.uint32)


# ---------------------------------------------------------------------------
# modular add / sub / compare
#
# Device values live in the REDUNDANT range [0, 2p): Montgomery products of
# [0,2p) operands land back in [0,2p) without a conditional subtract
# (4p^2 < pR for both BN254 moduli), and add/sub re-enter the range with a
# single conditional subtract of 2p.  Canonical [0,p) form is produced only
# at boundaries (from_mont / canon) — bit decompositions and host exports.
# ---------------------------------------------------------------------------

def _cond_sub(r: jnp.ndarray, comp: np.ndarray) -> jnp.ndarray:
    """If r >= m (where comp = 2^256 - m): r - m, else r. r normalized."""
    s = r + jnp.asarray(comp)
    s_norm, cout = _normalize(s)
    return jnp.where((cout >= 1)[..., None], s_norm, r)


def add(a: jnp.ndarray, b: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Redundant add: [0,2p) x [0,2p) -> [0,2p)."""
    t, _ = _normalize(a + b)
    return _cond_sub(t, fs.p2_comp_limbs)


def sub(a: jnp.ndarray, b: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Redundant sub: a - b + 2p, re-ranged to [0,2p)."""
    # a + ~b + (2p+1) == a - b + 2p + 2^256 -> drop the guaranteed carry
    comp_b = jnp.uint32(LIMB_MASK) - b
    t = a + comp_b + jnp.asarray(fs.p2_plus1_limbs)
    s, _ = _normalize(t)
    return _cond_sub(s, fs.p2_comp_limbs)


def neg(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """2p - a (a redundant zero maps to another redundant zero)."""
    comp_a = jnp.uint32(LIMB_MASK) - a
    t = comp_a + jnp.asarray(fs.p2_plus1_limbs)
    s, _ = _normalize(t)
    return _cond_sub(s, fs.p2_comp_limbs)


def canon(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Reduce a redundant [0,2p) value to canonical [0,p)."""
    return _cond_sub(a, fs.p_comp_limbs)


def sub_canonical(a: jnp.ndarray, b: jnp.ndarray,
                  fs: FieldSpec = FR) -> jnp.ndarray:
    """Canonical subtract for plain-form arithmetic feeding bit
    decompositions: inputs/outputs in [0,p)."""
    return canon(sub(a, b, fs), fs)


def add_canonical(a: jnp.ndarray, b: jnp.ndarray,
                  fs: FieldSpec = FR) -> jnp.ndarray:
    return canon(add(a, b, fs), fs)


# ---------------------------------------------------------------------------
# Montgomery multiplication (full-word reduction, no limb recurrence)
# ---------------------------------------------------------------------------

def mont_reduce_wide(cols: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """cols: (..., 33) column sums (each < 2^32) of a value T < p*R.
    Returns a representative of T * R^{-1} mod p in [0, 2p)."""
    t, _ = _normalize(cols)                       # (..., 33), limbs < 2^16
    m_cols = _mul_wide(t[..., :N_LIMBS], jnp.asarray(fs.nprime_limbs))
    m_norm, _ = _normalize(m_cols[..., :N_LIMBS])  # only low 16 limbs matter
    mp = _mul_wide(m_norm, jnp.asarray(fs.p_limbs))  # (..., 33)
    total, _ = _normalize(t + mp)                 # T + m*p, divisible by R
    return total[..., N_LIMBS:2 * N_LIMBS]        # >> 256; < 2p


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1}; redundant [0,2p) in/out."""
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, (*batch, N_LIMBS))
    b = jnp.broadcast_to(b, (*batch, N_LIMBS))
    return mont_reduce_wide(_mul_wide(a, b), fs)


def mont_sqr(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    return mont_mul(a, a, fs)


def to_mont(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    return mont_mul(a, jnp.asarray(fs.r2_limbs), fs)


def from_mont(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Montgomery -> canonical plain form in [0, p)."""
    one = jnp.zeros(N_LIMBS, dtype=jnp.uint32).at[0].set(1)
    return canon(mont_mul(a, one, fs), fs)


# ---------------------------------------------------------------------------
# exponentiation / inversion
# ---------------------------------------------------------------------------

def pow_bits(a: jnp.ndarray, bits: np.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """a^e, e as LSB-first bit array (static length); Montgomery in/out."""
    bits_arr = jnp.asarray(bits, dtype=jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(fs.one_mont), a.shape)

    def body(i, carry):
        acc, base = carry
        bit = bits_arr[i]
        mult = mont_mul(acc, base, fs)
        acc = jnp.where(bit == 1, mult, acc)
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
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(cond[..., None], a, b)


def zeros_like_batch(shape_prefix) -> jnp.ndarray:
    return jnp.zeros((*shape_prefix, N_LIMBS), dtype=jnp.uint32)

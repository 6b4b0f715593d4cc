"""TPU-native multi-limb modular arithmetic for BN254 (JAX, vectorized).

Representation: 20 little-endian limbs of 14 bits in uint32 lanes, shape
``(..., 20)``, Montgomery radix R = 2^280.  The deliberately over-wide
radix buys a *lazy* arithmetic style that is the heart of the design:

  * ADD is one vector add — no carry propagation.  Limb "amplitude" (how
    many lazy adds deep a value is) grows; multiplications and cheap local
    carry rounds shrink it back.  Products of limbs stay exact in uint32
    for amplitudes up to 4 ((4*(2^14-1))^2 < 2^32).
  * SUB is borrow-free: a - b == a + (D - b) where D is a precomputed
    spread multiple of p whose limbs dominate b's (per amplitude).
  * MUL is an unrolled schoolbook shift-accumulate over uint32 lanes (VPU;
    working set stays at 41 columns per lane — no big temps), and the
    full-word Montgomery reduction (m = T_lo * (-p^-1 mod R) mod R, then
    (T + m*p) >> 280) has no sequential limb recurrence.  ONE Kogge-Stone
    carry resolution per multiply (needed for the exact shift by R); none
    anywhere else.
  * Values are redundant — any representative of the residue class with
    value < ~2^272 and limbs < 2^16.  Montgomery outputs are < 2^265 with
    amplitude-1 limbs.  Canonical [0, p) form is produced only at
    boundaries (from_mont / canon).

Everything is elementwise or matmul — no scatters, no data-dependent
control flow — so the field layer vmaps/shards over voter batches and
compiles fast.

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

N_LIMBS = 20
LIMB_BITS = 14
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = N_LIMBS * LIMB_BITS  # Montgomery R = 2^280
WIDE = 2 * N_LIMBS + 1        # 41 columns for a full product
MAX_AMP = 4                   # max limb amplitude allowed into a multiply


def int_to_limbs(x: int) -> np.ndarray:
    """Python int -> (20,) uint32 limb array (little-endian 14-bit limbs)."""
    assert 0 <= x < (1 << R_BITS)
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK
                     for i in range(N_LIMBS)], dtype=np.uint32)


def ints_to_limbs(xs) -> np.ndarray:
    return np.stack([int_to_limbs(int(x)) for x in xs], axis=0) \
        if len(xs) else np.zeros((0, N_LIMBS), np.uint32)


def limbs_to_int(a) -> int:
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(a[..., i]) << (LIMB_BITS * i) for i in range(a.shape[-1]))


def limbs_to_ints(a) -> list:
    a = np.asarray(a)
    flat = a.reshape(-1, a.shape[-1])
    return [limbs_to_int(row) for row in flat]


# Two subtrahend tiers (see sub()): TIGHT covers b with value < 2^268
# (Montgomery outputs and small lazy sums of them, value <= ~2^267); LOOSE
# covers b with value < 2^271 (e.g. complete-addition outputs, which are
# bounded by one tight-D plus a product, ~2^269.6).  The tiering is what
# keeps the value-growth recursion convergent: tight subs inside the EC
# formula bound its outputs strictly below the loose cover.
B_TIGHT_BITS = 268
B_LOOSE_BITS = 271
_AMP_SLOP = 8  # weak-normalized "amplitude-1" limbs can exceed the mask by
               # a few carries; the spread floors include this slop


def _spread_sub_const(p: int, amp: int, b_bits: int) -> np.ndarray:
    """Constant D with value a multiple of p whose limb i dominates any
    b-limb possible for amplitude <= amp AND value < 2^b_bits, making
    D - b borrow-free limbwise."""
    base_limbs = np.zeros(N_LIMBS, dtype=np.uint64)
    for i in range(N_LIMBS):
        cap = min(amp * LIMB_MASK + _AMP_SLOP,
                  (1 << max(0, b_bits - LIMB_BITS * i)) - 1
                  + amp + _AMP_SLOP)
        base_limbs[i] = cap
    base_val = sum(int(v) << (LIMB_BITS * i)
                   for i, v in enumerate(base_limbs))
    k = -base_val % p
    # add k (canonical limbs) on top — value becomes a multiple of p
    extra = [(k >> (LIMB_BITS * i)) & LIMB_MASK for i in range(N_LIMBS)]
    out = base_limbs + np.asarray(extra, dtype=np.uint64)
    assert (sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(out))
            % p == 0)
    assert out.max() < (1 << 31)
    return out.astype(np.uint32)


class FieldSpec(NamedTuple):
    """Static per-field constants (baked into traced programs)."""
    p: int
    p_limbs: np.ndarray        # (20,) uint32 canonical
    p_comp_limbs: np.ndarray   # 2^280 - p (for exact conditional subtract)
    sub_d1: np.ndarray         # TIGHT spread consts (b value < 2^268)
    sub_d2: np.ndarray
    sub_d4: np.ndarray
    sub_l1: np.ndarray         # LOOSE spread consts (b value < 2^271)
    sub_l2: np.ndarray
    sub_l4: np.ndarray
    nprime_limbs: np.ndarray   # -p^{-1} mod 2^280
    r_mod_p: int
    r2_limbs: np.ndarray       # R^2 mod p
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
        sub_d1=_spread_sub_const(p, 1, B_TIGHT_BITS),
        sub_d2=_spread_sub_const(p, 2, B_TIGHT_BITS),
        sub_d4=_spread_sub_const(p, 4, B_TIGHT_BITS),
        sub_l1=_spread_sub_const(p, 1, B_LOOSE_BITS),
        sub_l2=_spread_sub_const(p, 2, B_LOOSE_BITS),
        sub_l4=_spread_sub_const(p, 4, B_LOOSE_BITS),
        nprime_limbs=int_to_limbs(nprime),
        r_mod_p=r % p,
        r2_limbs=int_to_limbs(r * r % p),
        one_mont=int_to_limbs(r % p),
        p_minus_2_bits=bits,
    )


FR = make_field(ff.P_FR)
FQ = make_field(ff.P_FQ)


# ---------------------------------------------------------------------------
# carry handling
# ---------------------------------------------------------------------------

def _shift_right_one(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.pad(x[..., :n - 1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])


def weak_normalize(t: jnp.ndarray, rounds: int = 1) -> jnp.ndarray:
    """Cheap amplitude reduction (no exact carry resolution): each round
    folds limb overflow one position left.  One round takes limbs < 2^28
    down to < 2^14 + 2^14 (amplitude ~2); two rounds to ~2^14 + 1."""
    w = t.shape[-1]
    for _ in range(rounds):
        lo = t & LIMB_MASK
        hi = t >> LIMB_BITS
        t = lo + _shift_right_one(hi, w)
    return t


def _normalize_exact(t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact carry resolution (Kogge-Stone): limbs (< 2^32) -> (< 2^14),
    plus total carry-out beyond the top limb."""
    w = t.shape[-1]
    extra = jnp.zeros(t.shape[:-1], dtype=jnp.uint32)
    for _ in range(2):
        lo = t & LIMB_MASK
        hi = t >> LIMB_BITS
        extra = extra + hi[..., w - 1]
        t = lo + _shift_right_one(hi, w)
    g = t >> LIMB_BITS              # generate (0/1)
    d = t & LIMB_MASK
    pp = (d == LIMB_MASK).astype(jnp.uint32)  # propagate
    shift = 1
    while shift < w:
        gs = jnp.pad(g[..., :w - shift],
                     [(0, 0)] * (g.ndim - 1) + [(shift, 0)])
        ps = jnp.pad(pp[..., :w - shift],
                     [(0, 0)] * (pp.ndim - 1) + [(shift, 0)],
                     constant_values=1)
        g = g | (pp & gs)
        pp = pp & ps
        shift *= 2
    carry_in = _shift_right_one(g, w)
    out = (d + carry_in) & LIMB_MASK
    carry_out = g[..., w - 1] + extra
    return out, carry_out


# ---------------------------------------------------------------------------
# lazy modular add / sub
# ---------------------------------------------------------------------------

def add(a: jnp.ndarray, b: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Lazy add: one vector op.  Amplitude is the sum of the operands'."""
    return a + b


def _sub_const(fs: FieldSpec, b_amp: int, loose: bool) -> np.ndarray:
    if loose:
        return {1: fs.sub_l1, 2: fs.sub_l2, 4: fs.sub_l4}[b_amp]
    return {1: fs.sub_d1, 2: fs.sub_d2, 4: fs.sub_d4}[b_amp]


def sub(a: jnp.ndarray, b: jnp.ndarray, fs: FieldSpec = FR,
        b_amp: int = 1, loose: bool = False) -> jnp.ndarray:
    """Borrow-free lazy subtract: a - b + D where D is a spread multiple of
    p dominating b limbwise.  b must have amplitude <= b_amp (1, 2 or 4)
    and value < 2^268 (tight, default) or < 2^271 (loose=True)."""
    return a + (jnp.asarray(_sub_const(fs, b_amp, loose)) - b)


def neg(a: jnp.ndarray, fs: FieldSpec = FR, amp: int = 1,
        loose: bool = False) -> jnp.ndarray:
    return jnp.asarray(_sub_const(fs, amp, loose)) - a


# ---------------------------------------------------------------------------
# wide products via constant matmul
# ---------------------------------------------------------------------------

def _mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full product columns: a, b (..., 20) with amplitude <= 4 ->
    (..., 41) uint32 column sums (each < 2^24).

    Unrolled schoolbook accumulation: each step multiplies one limb of `a`
    against all of `b` and shift-accumulates the lo/hi splits.  The working
    set stays at (..., 41) — an earlier matmul-against-routing-matrix
    formulation materialized (..., 800) f32 temps, which blew HBM (9GB+
    temps) at MSM scan widths and was memory- not compute-bound."""
    cols = jnp.zeros((*a.shape[:-1], WIDE), dtype=jnp.uint32)
    for i in range(N_LIMBS):
        prod = a[..., i:i + 1] * b                     # (..., 20), exact
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        cols = cols.at[..., i:i + N_LIMBS].add(lo)
        cols = cols.at[..., i + 1:i + N_LIMBS + 1].add(hi)
    return cols


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------

def mont_reduce_wide(cols: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """cols: (..., 41) column sums (< 2^28) of a value T.
    Returns a representative of T * R^{-1} mod p with amplitude-1 limbs;
    bound: T/R + (1+eps) * p."""
    t = weak_normalize(cols, rounds=2)            # limbs <= 2^14 + 1
    m_cols = _mul_wide(t[..., :N_LIMBS], jnp.asarray(fs.nprime_limbs))
    m = weak_normalize(m_cols[..., :N_LIMBS], rounds=2)  # mod 2^280 rep
    mp = _mul_wide(m, jnp.asarray(fs.p_limbs))    # (..., 41)
    total, _ = _normalize_exact(t + mp)           # exact: low half ≡ 0
    return total[..., N_LIMBS:2 * N_LIMBS]        # >> 280


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p (representative < ~2^265).
    Operand limb amplitudes must multiply to <= 16 (e.g. 4 x 4)."""
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


def _cond_sub_exact(r: jnp.ndarray, fs: FieldSpec) -> jnp.ndarray:
    """r exact-normalized, value < 2p -> canonical [0, p)."""
    s = r + jnp.asarray(fs.p_comp_limbs)
    s_norm, cout = _normalize_exact(s)
    return jnp.where((cout >= 1)[..., None], s_norm, r)


def from_mont(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Montgomery -> canonical plain form in [0, p).
    Accepts any amplitude-<=4 representative with value < 2^273."""
    one = jnp.zeros(N_LIMBS, dtype=jnp.uint32).at[0].set(1)
    v = mont_mul(a, one, fs)          # value <= p + T/R < p + 2^-7 p < 2p
    v, _ = _normalize_exact(v)
    return _cond_sub_exact(v, fs)


def canon(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Any representative -> canonical [0, p)."""
    return from_mont(to_mont(a, fs), fs)


def sub_canonical(a: jnp.ndarray, b: jnp.ndarray,
                  fs: FieldSpec = FR) -> jnp.ndarray:
    """Canonical subtract for plain-form arithmetic feeding bit
    decompositions: canonical in, canonical out."""
    return canon(sub(a, b, fs), fs)


def add_canonical(a: jnp.ndarray, b: jnp.ndarray,
                  fs: FieldSpec = FR) -> jnp.ndarray:
    return canon(a + b, fs)


# ---------------------------------------------------------------------------
# exponentiation / inversion
# ---------------------------------------------------------------------------

def pow_bits(a: jnp.ndarray, bits: np.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
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
# predicates / selection (CANONICAL or matching representations only)
# ---------------------------------------------------------------------------

def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(cond[..., None], a, b)


def zeros_like_batch(shape_prefix) -> jnp.ndarray:
    return jnp.zeros((*shape_prefix, N_LIMBS), dtype=jnp.uint32)

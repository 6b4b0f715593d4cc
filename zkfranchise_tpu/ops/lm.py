"""Limb-major TPU field core for BN254: 21 x 13-bit limbs, R = 2^273.

Layout: field elements are int32 arrays of shape ``(..., 21, T)`` — the
LIMB axis rides the TPU sublanes, the element/batch axis ``T`` rides the
128-wide lanes.  Every elementwise op therefore runs at full lane
utilization (the older lane-minor ``(..., 20)`` layout in ops/limbs.py
uses 20/128 lanes), and all shifts in carry handling are static sublane
slices.  The same functions run

  * inside Pallas TPU kernels (operands are VMEM refs' values), and
  * under plain ``jax.jit`` on any backend (CPU tests, dry-runs),

so there is exactly one arithmetic implementation to trust.

Parameter choice (why 13 x 21):
  * products of two 13-bit limbs are < 2^26.2 for "normalized" limbs
    (<= 2^13 + 63 slop), so a full 21-term schoolbook column accumulates
    raw products in int32 with no per-step splitting:
    21 * (2^13+63)^2 < 2^30.5 < 2^31.
  * R = 2^273 leaves 2^19 of headroom over p (~2^254), so value growth
    from lazy sums and spread-constant subtractions never approaches the
    Montgomery input budget — there is ONE normalization rule instead of
    the two-tier amplitude bookkeeping of the 20x14 core:
        weak-normalize any sum/difference before it enters a multiply.

Replaces the snarkjs/go-rapidsnark bigint arithmetic
(SURVEY.md §2b "BN254 field & curve arithmetic"; Fr modulus constant at
/root/reference/internal/helpers.go:15).  Host oracle: ops/ff.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ff

LIMB_BITS = 13
N_LIMBS = 21
MASK = (1 << LIMB_BITS) - 1
R_BITS = LIMB_BITS * N_LIMBS          # 273
WIDE = 2 * N_LIMBS + 1                # 43
DTYPE = jnp.int32


# ---------------------------------------------------------------------------
# host conversions
# ---------------------------------------------------------------------------

def int_to_limbs(x: int) -> np.ndarray:
    """Python int -> (21,) int32 column vector values (little-endian)."""
    assert 0 <= x < (1 << R_BITS)
    return np.array([(x >> (LIMB_BITS * i)) & MASK for i in range(N_LIMBS)],
                    dtype=np.int32)

def ints_to_lm(xs) -> np.ndarray:
    """List of n ints -> (21, n) limb-major plane."""
    if not len(xs):
        return np.zeros((N_LIMBS, 0), np.int32)
    return np.stack([int_to_limbs(int(x)) for x in xs], axis=1)

def lm_to_ints(a) -> list:
    """(..., 21, n) -> flat list of ints (exact; limbs may exceed 13 bits)."""
    a = np.asarray(a, dtype=np.int64)
    flat = a.reshape(-1, *a.shape[-2:])
    out = []
    for plane in flat:
        for j in range(plane.shape[-1]):
            out.append(sum(int(plane[i, j]) << (LIMB_BITS * i)
                           for i in range(plane.shape[0])))
    return out


# ---------------------------------------------------------------------------
# field spec
# ---------------------------------------------------------------------------

def _spread_sub_const(p: int, b_bits: int) -> np.ndarray:
    """Multiple of p whose limb i dominates any nonnegative-limb value
    < 2^b_bits with normalized limbs (<= 2^13 + 63), making D - b
    nonnegative limbwise.  A nonnegative representation with value
    < 2^b_bits has limb_i <= value >> (13 i), so limbs above the value
    boundary need no slop — keeping D's value ~2^b_bits (its top rows
    stay zero, which stacked-Fq2 weak_norm correctness relies on)."""
    base = np.zeros(N_LIMBS, dtype=np.int64)
    for i in range(N_LIMBS):
        pos = b_bits - LIMB_BITS * i
        cap = 0 if pos <= 0 else min(MASK + 64, (1 << pos) - 1)
        base[i] = cap
    val = sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(base))
    k = -val % p
    out = base + np.asarray([(k >> (LIMB_BITS * i)) & MASK
                             for i in range(N_LIMBS)], dtype=np.int64)
    assert sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(out)) % p == 0
    assert out.max() < (1 << 15)
    return out.astype(np.int32)


class FieldSpec(NamedTuple):
    p: int
    p_limbs: np.ndarray          # (21, 1) canonical
    nprime_limbs: np.ndarray     # (21, 1): -p^-1 mod 2^273
    sub_d: np.ndarray            # (21, 1) spread multiple of p (b < 2^257)
    sub_d1: np.ndarray           # (21, 1) TIGHT spread multiple (b < 2^255):
                                 # value < 2^256, for subtrahends that are
                                 # single Montgomery outputs — keeps Fq2
                                 # product components < 2^256 so they fit
                                 # the 2^257 sub_d budget downstream
    sub_d2: np.ndarray           # (21, 1) WIDE spread multiple (b < 2^259):
                                 # dominates any mul-operand value
                                 # (< 2^258.6), for the lazy-reduction
                                 # Fq2 path's pre-product negation
                                 # re = reduce(a0*b0 + a1*(D2 - b1));
                                 # T0 < 2^518 << R*2^257, the
                                 # mont_reduce carry-trick budget
    r_mod_p: int
    r2_limbs: np.ndarray         # (21, 1): R^2 mod p
    one_mont: np.ndarray         # (21, 1): R mod p
    p_comp_limbs: np.ndarray     # (21, 1): 2^273 - p
    p_minus_2_bits: np.ndarray


@functools.lru_cache(maxsize=None)
def make_field(p: int) -> FieldSpec:
    r = 1 << R_BITS
    nprime = (-pow(p, -1, r)) % r
    e = p - 2
    bits = np.array([(e >> i) & 1 for i in range(p.bit_length())],
                    dtype=np.int32)
    col = lambda v: int_to_limbs(v)[:, None]
    return FieldSpec(
        p=p,
        p_limbs=col(p),
        nprime_limbs=col(nprime),
        sub_d=_spread_sub_const(p, 257)[:, None],
        sub_d1=_spread_sub_const(p, 255)[:, None],
        sub_d2=_spread_sub_const(p, 259)[:, None],
        r_mod_p=r % p,
        r2_limbs=col(r * r % p),
        one_mont=col(r % p),
        p_comp_limbs=col(r - p),
        p_minus_2_bits=bits,
    )


FR = make_field(ff.P_FR)
FQ = make_field(ff.P_FQ)


class KernelField(NamedTuple):
    """Traced-array view of the FieldSpec constants a Pallas kernel needs
    (kernels cannot capture array constants; they arrive as one (21, 5)
    input and are re-sliced inside the kernel)."""
    p_limbs: jnp.ndarray
    nprime_limbs: jnp.ndarray
    sub_d: jnp.ndarray
    one_mont: jnp.ndarray
    sub_d1: jnp.ndarray
    sub_d2: jnp.ndarray


N_CONST_ROWS = 6


def pack_consts(fs: FieldSpec, tile: int = 1) -> np.ndarray:
    """(5*21, tile) int32 constant block to feed a kernel.  Constants are
    materialized at full lane width so in-kernel per-limb slices are real
    loads, not broadcasts."""
    c = np.concatenate(
        [fs.p_limbs, fs.nprime_limbs, fs.sub_d, fs.one_mont, fs.sub_d1,
         fs.sub_d2],
        axis=0).astype(np.int32)                       # (126, 1)
    return np.broadcast_to(c, (N_CONST_ROWS * N_LIMBS, tile)).copy()


def unpack_consts(c: jnp.ndarray) -> KernelField:
    n = N_LIMBS
    return KernelField(p_limbs=c[..., 0 * n:1 * n, :],
                       nprime_limbs=c[..., 1 * n:2 * n, :],
                       sub_d=c[..., 2 * n:3 * n, :],
                       one_mont=c[..., 3 * n:4 * n, :],
                       sub_d1=c[..., 4 * n:5 * n, :],
                       sub_d2=c[..., 5 * n:6 * n, :])


# ---------------------------------------------------------------------------
# carry handling (shifts are along the SUBLANE axis, -2)
# ---------------------------------------------------------------------------

def _down1(x: jnp.ndarray) -> jnp.ndarray:
    """Shift limbs one position up (toward higher index) along axis -2,
    i.e. prepend a zero row and drop the top row."""
    pad = [(0, 0)] * x.ndim
    pad[-2] = (1, 0)
    return jnp.pad(x[..., :-1, :], pad)


def weak_norm(t: jnp.ndarray, rounds: int = 1) -> jnp.ndarray:
    """Fold limb overflow one position up per round; drops carry-out of
    the top row (callers arrange that it is zero / mod-R semantics)."""
    for _ in range(rounds):
        t = (t & MASK) + _down1(t >> LIMB_BITS)
    return t


def norm_exact_carry(t: jnp.ndarray):
    """Exact carry resolution (Kogge-Stone over sublanes): limbs < 2^31
    -> (limbs in [0, 2^13) == value mod R', carry beyond the top row),
    where R' = 2^(13*nrows).  The weak rounds may themselves drop carry
    only if the top limb exceeds 2^13 - callers keep top columns small."""
    w = t.shape[-2]
    t = weak_norm(t, 2)
    g = t >> LIMB_BITS                  # 0/1 generate
    d = t & MASK
    pp = (d == MASK).astype(DTYPE)      # propagate
    shift = 1
    while shift < w:
        pad = [(0, 0)] * t.ndim
        pad[-2] = (shift, 0)
        gs = jnp.pad(g[..., :w - shift, :], pad)
        ps = jnp.pad(pp[..., :w - shift, :], pad, constant_values=1)
        g = g | (pp & gs)
        pp = pp & ps
        shift *= 2
    out = (d + _down1(g)) & MASK
    return out, g[..., w - 1:w, :]


def norm_exact(t: jnp.ndarray) -> jnp.ndarray:
    """Exact carry resolution; carry out of the top row must be zero."""
    return norm_exact_carry(t)[0]


# ---------------------------------------------------------------------------
# schoolbook products (raw int32 column accumulation, no splitting)
# ---------------------------------------------------------------------------
# Two bit-identical implementations:
#   * UNROLLED (static slices + pads) — the only form Mosaic can lower, so
#     Pallas kernel wrappers flip the module flag while tracing bodies;
#   * ROLLED (fori_loop + dynamic_update_slice) — ~150x fewer traced ops,
#     which cuts whole-witness XLA compile time ~8x; the loop-carried dep
#     is invisible at NTT/witness widths where each iteration is wide.

UNROLL = False


def _bcast_lanes(x, batch, tlanes):
    """Broadcast to (*batch, 21, tlanes).  NOTE: inside Pallas kernels a
    lane-1 operand must already be materialized at full lane width (see
    pack_consts(tile=...)) — Mosaic cannot lower a per-limb slice of a
    lane-broadcast (it folds to a two-axis broadcast, unsupported)."""
    return jnp.broadcast_to(x, (*batch, N_LIMBS, tlanes))


def _bcast_pair(a, b):
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    tlanes = max(a.shape[-1], b.shape[-1])
    return (_bcast_lanes(a, batch, tlanes), _bcast_lanes(b, batch, tlanes),
            batch, tlanes)


@jax.jit
def _wide_mul_rolled(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pre-broadcast operands.  The jit wrapper caches the traced jaxpr per
    shape, so hundreds of mont_mul call sites trace in O(1) each."""
    cols0 = jnp.zeros((*a.shape[:-2], WIDE, a.shape[-1]), DTYPE)

    def body(i, cols):
        prod = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=-2) * b
        upd = jax.lax.dynamic_update_slice_in_dim(
            jnp.zeros_like(cols), prod, i, axis=-2)
        return cols + upd

    return jax.lax.fori_loop(0, N_LIMBS, body, cols0)


@jax.jit
def _low_mul_rolled(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    cols0 = jnp.zeros((*a.shape[:-2], N_LIMBS, a.shape[-1]), DTYPE)

    def body(i, cols):
        prod = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=-2) * b
        upd = jax.lax.dynamic_update_slice_in_dim(
            jnp.zeros((*a.shape[:-2], 2 * N_LIMBS, a.shape[-1]), DTYPE),
            prod, i, axis=-2)[..., :N_LIMBS, :]
        return cols + upd

    return jax.lax.fori_loop(0, N_LIMBS, body, cols0)


def wide_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a, b: (..., 21, T) normalized limbs -> (..., 43, T) column sums."""
    a, b, batch, tlanes = _bcast_pair(a, b)
    if UNROLL:
        cols = None
        for i in range(N_LIMBS):
            prod = a[..., i:i + 1, :] * b
            pad = [(0, 0)] * prod.ndim
            pad[-2] = (i, WIDE - i - N_LIMBS)
            shifted = jnp.pad(prod, pad)
            cols = shifted if cols is None else cols + shifted
        return cols
    return _wide_mul_rolled(a, b)


def low_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Low 21 columns of a*b (for m = t * n' mod R): triangular work."""
    a, b, batch, tlanes = _bcast_pair(a, b)
    if UNROLL:
        cols = None
        for i in range(N_LIMBS):
            hi = N_LIMBS - i
            prod = a[..., i:i + 1, :] * b[..., :hi, :]
            pad = [(0, 0)] * prod.ndim
            pad[-2] = (i, 0)
            shifted = jnp.pad(prod, pad)
            cols = shifted if cols is None else cols + shifted
        return cols
    return _low_mul_rolled(a, b)


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------

def mont_reduce(cols: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """cols: (..., 43, T) column sums of T0 < R*2^257 -> representative of
    T0 * R^-1 mod p, limbs <= 2^13 + 2 (normalized, not exact).

    Carry trick instead of a full Kogge-Stone resolve: t + m*p ≡ 0 mod R,
    and after 3 weak rounds its low half has limbs <= 2^13 + 1, hence
    value < 2R — so the low half is EXACTLY 0 or R.  The carry into the
    high half is therefore just "any low limb nonzero"."""
    t = weak_norm(cols, 2)                         # limbs <= 2^13 + eps
    m = low_mul(t[..., :N_LIMBS, :], jnp.asarray(fs.nprime_limbs))
    m = weak_norm(m, 2)                            # == t*n' mod R (repr)
    mp = wide_mul(m, jnp.asarray(fs.p_limbs))
    s = weak_norm(t + mp, 3)                       # limbs <= 2^13 + 1
    low_nonzero = jnp.any(s[..., :N_LIMBS, :] != 0, axis=-2, keepdims=True)
    carry = low_nonzero.astype(DTYPE)              # low half is 0 or R
    pad = [(0, 0)] * s.ndim
    pad[-2] = (0, N_LIMBS - 1)
    return s[..., N_LIMBS:2 * N_LIMBS, :] + jnp.pad(carry, pad)


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p.  Operands must be normalized
    (limbs <= 2^13+63); values anything < 2^260.  Output: exact 13-bit
    limbs, value < p * (1 + 2^-19)."""
    return mont_reduce(wide_mul(a, b), fs)


def mont_sqr(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    return mont_mul(a, a, fs)


def to_mont(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    return mont_mul(a, jnp.asarray(fs.r2_limbs), fs)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lazy add.  NORMALIZE (weak_norm) before feeding a multiply."""
    return a + b


def add_n(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Normalized add: safe as a multiplier operand."""
    return weak_norm(a + b)


def sub_n(a: jnp.ndarray, b: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Normalized subtract: a - b + D, D a spread multiple of p dominating
    normalized b (value < 2^257).  a may be one lazy-add deep."""
    return weak_norm(a + (jnp.asarray(fs.sub_d) - b))


def neg_n(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    return weak_norm(jnp.asarray(fs.sub_d) - a)


def _cond_sub_p(r: jnp.ndarray, fs: FieldSpec) -> jnp.ndarray:
    """r exact limbs, value < 2p -> canonical [0, p).  Adds R - p; iff
    that overflows R (i.e. r >= p) the wrapped value r - p is kept."""
    wrapped, carry = norm_exact_carry(r + jnp.asarray(fs.p_comp_limbs))
    return jnp.where(carry >= 1, wrapped, r)


def from_mont(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Montgomery (any normalized rep < 2^257) -> canonical plain [0, p)."""
    one = jnp.zeros((N_LIMBS, 1), DTYPE).at[0, 0].set(1)
    v = norm_exact(mont_mul(a, one, fs))    # value < p (1 + 2^-19) < 2p
    return _cond_sub_p(v, fs)


def canon(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    return from_mont(to_mont(a, fs), fs)


def pow_bits(a: jnp.ndarray, bits: np.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """a^e for e given as little-endian bit array (host constant)."""
    bits_arr = jnp.asarray(bits, dtype=DTYPE)
    one = jnp.broadcast_to(jnp.asarray(fs.one_mont), a.shape)

    def body(i, carry):
        acc, base = carry
        mult = mont_mul(acc, base, fs)
        acc = jnp.where(bits_arr[i] == 1, mult, acc)
        return acc, mont_sqr(base, fs)

    acc, _ = jax.lax.fori_loop(0, bits_arr.shape[0], body, (one, a))
    return acc


def inv(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Montgomery inverse via Fermat (inv(0) = 0)."""
    return pow_bits(a, fs.p_minus_2_bits, fs)


def batch_inv_lanes(a: jnp.ndarray, fs: FieldSpec = FR) -> jnp.ndarray:
    """Montgomery-batch inversion across the LANE axis of (21, X) (X a
    power of two): one Fermat inversion total + ~3 muls per lane.
    Zero lanes must have been mapped to one by the caller."""
    x = a
    levels = [x]
    while x.shape[-1] > 1:
        half = x.shape[-1] // 2
        x = mont_mul(x[..., :half], x[..., half:], fs)
        levels.append(x)
    root_inv = inv(x, fs)                    # (21, 1)
    invs = root_inv
    # walk down: inv of each half from inv of the product
    for lvl in range(len(levels) - 2, -1, -1):
        cur = levels[lvl]
        half = cur.shape[-1] // 2
        left = mont_mul(invs, cur[..., half:], fs)   # inv of left half
        right = mont_mul(invs, cur[..., :half], fs)  # inv of right half
        invs = jnp.concatenate([left, right], axis=-1)
    return invs


# ---------------------------------------------------------------------------
# bit / digit extraction (plain EXACT canonical limbs required)
# ---------------------------------------------------------------------------

def bits_from_plain(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """x: (..., 21, T) plain-form EXACT 13-bit limbs -> (n, ..., T) int32
    0/1 bits, LSB first (the bit axis becomes the new leading axis)."""
    rows = []
    for i in range(n):
        limb, s = divmod(i, LIMB_BITS)
        rows.append((x[..., limb, :] >> s) & 1)
    return jnp.stack(rows, axis=0)


def window_digits(x: jnp.ndarray, wbits: int = 8,
                  nwin: int = 32) -> jnp.ndarray:
    """x: (N, 21, T) plain EXACT canonical limbs -> (nwin, N, T) int32
    wbits-bit little-endian windows (Pippenger digit decomposition)."""
    wins = []
    for w in range(nwin):
        off = w * wbits
        i, s = divmod(off, LIMB_BITS)
        d = x[..., i, :] >> s if i < N_LIMBS else jnp.zeros_like(x[..., 0, :])
        if s + wbits > LIMB_BITS and i + 1 < N_LIMBS:
            d = d | (x[..., i + 1, :] << (LIMB_BITS - s))
        wins.append(d & ((1 << wbits) - 1))
    return jnp.stack(wins, axis=0)

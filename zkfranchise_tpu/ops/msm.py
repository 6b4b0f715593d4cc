"""Device multi-scalar multiplication (Pippenger) for BN254 G1/G2.

The Groth16 prover's hot loop #3 (SURVEY.md §3.3) — replaces
go-rapidsnark's goroutine MSM with a TPU formulation:

  * 8-bit windows (32 of them) treated as a leading BATCH axis, so all
    windows' bucket accumulations run as wide vectorized ops (grouped to
    bound memory);
  * per window: sort points by bucket digit (jnp.argsort), then a Blelloch
    inclusive prefix scan whose combiner is the branch-free complete
    addition formula (ops/ec_jax.py) — 2n vectorized EC adds in log depth;
  * bucket sums read off the prefix at segment ends, and the weighted
    bucket total computed by the telescoped identity
        sum_b b*S_b = 255*total - sum_{b<255} cum[b],
    which needs one 255-leaf add-tree instead of a serial bucket walk;
  * windows combined Horner-style under a tiny `lax.scan` (8 doublings +
    1 add per window on single points).

Scalars stay in plain (non-Montgomery) limb form; points are packed
(n, C, 16) Montgomery coordinate arrays (C=3 for G1, 6 for G2).  Batch
dims on scalars broadcast; the same point table serves the whole batch.

Data-parallel sharding shards the scalar batch; point-sharded MSM with
psum bucket reduction lives in parallel/ (SURVEY.md §2c).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ec_jax, limbs
from .ec_jax import G1Point, G2Point
from .limbs import N_LIMBS

WINDOW_BITS = 8
N_WINDOWS = 32
N_BUCKETS = 1 << WINDOW_BITS
# how many (window x batch) lanes to run through one Blelloch scan; bounds
# the scan's level-buffer memory (~2 * lanes * n * C * 80B)
WINDOW_GROUP = 32


# ---------------------------------------------------------------------------
# packed point helpers
# ---------------------------------------------------------------------------

def pack_g1(p: G1Point) -> jnp.ndarray:
    return jnp.stack([p.x, p.y, p.z], axis=-2)          # (..., 3, 16)


def unpack_g1(a: jnp.ndarray) -> G1Point:
    return G1Point(a[..., 0, :], a[..., 1, :], a[..., 2, :])


def pack_g2(p: G2Point) -> jnp.ndarray:
    # (..., 2, 16) coords -> (..., 6, 16)
    return jnp.concatenate([p.x, p.y, p.z], axis=-2)


def unpack_g2(a: jnp.ndarray) -> G2Point:
    return G2Point(a[..., 0:2, :], a[..., 2:4, :], a[..., 4:6, :])


def _g1_padd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return pack_g1(ec_jax.g1_add(unpack_g1(a), unpack_g1(b)))


def _g2_padd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return pack_g2(ec_jax.g2_add(unpack_g2(a), unpack_g2(b)))


def _g1_pneg(a: jnp.ndarray) -> jnp.ndarray:
    return pack_g1(ec_jax.g1_neg(unpack_g1(a)))


def _g2_pneg(a: jnp.ndarray) -> jnp.ndarray:
    return pack_g2(ec_jax.g2_neg(unpack_g2(a)))


def _g1_pidentity(shape) -> np.ndarray:
    out = np.zeros((*shape, 3, N_LIMBS), dtype=np.uint32)
    out[..., 1, :] = limbs.FQ.one_mont
    return out


def _g2_pidentity(shape) -> np.ndarray:
    out = np.zeros((*shape, 6, N_LIMBS), dtype=np.uint32)
    out[..., 2, :] = limbs.FQ.one_mont  # y = 1 + 0u
    return out


_OPS = {
    "g1": (_g1_padd, _g1_pneg, _g1_pidentity, 3),
    "g2": (_g2_padd, _g2_pneg, _g2_pidentity, 6),
}


# ---------------------------------------------------------------------------
# digits
# ---------------------------------------------------------------------------

def window_digits(scalars: jnp.ndarray) -> jnp.ndarray:
    """CANONICAL plain limb scalars (..., n, 20) -> (..., n, 32) uint32
    8-bit digits, least-significant window first (windows cover bits
    0..255; canonical BN254 scalars are < 2^254)."""
    outs = []
    for w in range(N_WINDOWS):
        b0 = 8 * w
        i, s = divmod(b0, limbs.LIMB_BITS)
        d = scalars[..., i] >> s
        if s + 8 > limbs.LIMB_BITS and i + 1 < N_LIMBS:
            d = d | (scalars[..., i + 1] << (limbs.LIMB_BITS - s))
        outs.append(d & 0xFF)
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# Blelloch inclusive prefix scan over the point axis (-3 of packed points)
# ---------------------------------------------------------------------------

def _inclusive_scan_hillis(pts: jnp.ndarray, padd) -> jnp.ndarray:
    """Hillis-Steele inclusive scan via ONE fori_loop (tiny traced program;
    n*log n combiner work instead of Blelloch's 2n).  Used for the
    compile-friendly mode (multi-chip dry runs / sharded tests), where
    program size matters more than the ~7x extra vector work."""
    n = pts.shape[-3]
    log_n = n.bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)

    def body(l, x):
        sh = jnp.left_shift(jnp.int32(1), l)
        rolled = jnp.roll(x, sh, axis=-3)
        comb = padd(x, rolled)
        keep = lane >= sh
        return jnp.where(keep, comb, x)

    return jax.lax.fori_loop(0, log_n, body, pts)


def _inclusive_scan(pts: jnp.ndarray, padd, pneg) -> jnp.ndarray:
    """pts: (..., n, C, 16), n a power of two. Returns inclusive prefix
    sums along the n axis using 2(n-1) vectorized adds in log depth."""
    n = pts.shape[-3]
    levels = [pts]
    cur = pts
    while cur.shape[-3] > 1:
        m = cur.shape[-3]
        v = cur.reshape(*cur.shape[:-3], m // 2, 2, *cur.shape[-2:])
        cur = padd(v[..., 0, :, :], v[..., 1, :, :])
        levels.append(cur)
    # downsweep: inclusive scan; top level scan = itself
    scan = levels[-1]
    for lvl in range(len(levels) - 2, -1, -1):
        a = levels[lvl]
        m = a.shape[-3]
        v = a.reshape(*a.shape[:-3], m // 2, 2, *a.shape[-2:])
        odd = scan                       # scan over pairs = odd positions
        even = padd(scan, pneg(v[..., 1, :, :]))
        # interleave: out[2k] = even[k], out[2k+1] = odd[k]
        scan = jnp.stack([even, odd], axis=-3).reshape(
            *a.shape[:-3], m, *a.shape[-2:])
    return scan


def _tree_reduce(pts: jnp.ndarray, padd, identity) -> jnp.ndarray:
    """Sum over axis -3 (padded to a power of two with identity)."""
    n = pts.shape[-3]
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = jnp.broadcast_to(jnp.asarray(identity((1,))),
                               (*pts.shape[:-3], m - n, *pts.shape[-2:]))
        pts = jnp.concatenate([pts, pad], axis=-3)
    while pts.shape[-3] > 1:
        k = pts.shape[-3]
        v = pts.reshape(*pts.shape[:-3], k // 2, 2, *pts.shape[-2:])
        pts = padd(v[..., 0, :, :], v[..., 1, :, :])
    return pts[..., 0, :, :]


# ---------------------------------------------------------------------------
# MSM core
# ---------------------------------------------------------------------------

def _msm_packed(scalars: jnp.ndarray, points: jnp.ndarray, kind: str,
                compile_friendly: bool = False) -> jnp.ndarray:
    """scalars (..., n, 16) plain form; points (n, C, 16) Montgomery.
    Returns packed result point (..., C, 16)."""
    padd, pneg, pidentity, C = _OPS[kind]
    n = scalars.shape[-2]
    m = 1
    while m < n:
        m *= 2
    batch = scalars.shape[:-2]
    if m != n:
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((*batch, m - n, N_LIMBS), jnp.uint32)],
            axis=-2)
        points = jnp.concatenate(
            [points, jnp.asarray(pidentity((m - n,)))], axis=-3)
    n = m

    digits = window_digits(scalars)                     # (..., n, 32)
    # windows become a leading BATCH axis: all 32 bucket accumulations run
    # as wide vectorized ops (one argsort, one gather, one Blelloch scan),
    # processed in groups to bound the scan's level-buffer memory.
    digits_t = jnp.moveaxis(digits, -1, 0)              # (32, ..., n)

    bucket_ids = jnp.arange(N_BUCKETS - 1, dtype=jnp.uint32)  # 0..254

    def window_group_sums(d):
        # d: (G, ..., n) digits for a group of windows -> (G, ..., C, L)
        order = jnp.argsort(d, axis=-1)
        d_sorted = jnp.take_along_axis(d, order, axis=-1)
        pts = points[order]                             # (G, ..., n, C, L)
        if compile_friendly:
            prefix = _inclusive_scan_hillis(pts, padd)
        else:
            prefix = _inclusive_scan(pts, padd, pneg)
        total = prefix[..., n - 1, :, :]
        # cum[b] = prefix[count(d <= b) - 1]; count via compare-sum
        counts = jnp.sum(
            (d_sorted[..., :, None] <= bucket_ids).astype(jnp.int32),
            axis=-2)                                    # (G, ..., 255)
        idx = counts - 1                                # may be -1
        empty = idx < 0
        idx = jnp.clip(idx, 0, n - 1)
        cum = jnp.take_along_axis(
            prefix, idx[..., :, None, None].astype(jnp.int32), axis=-3)
        ident = jnp.asarray(pidentity(()))
        cum = jnp.where(empty[..., None, None], ident, cum)
        # W = 255 * total - sum_b cum[b] (b = 0..254)
        t255 = jax.lax.fori_loop(
            0, WINDOW_BITS, lambda _, t: padd(t, t), total)  # 256 * total
        t255 = padd(t255, pneg(total))                       # 255 * total
        u = _tree_reduce(cum, padd, pidentity)
        return padd(t255, pneg(u))

    group = max(1, WINDOW_GROUP // max(1, int(np.prod(batch) or 1)))
    n_groups = (N_WINDOWS + group - 1) // group
    w_sums = []
    for g in range(n_groups):
        w_sums.append(window_group_sums(
            digits_t[g * group:(g + 1) * group]))
    w_all = jnp.concatenate(w_sums, axis=0)             # (32, ..., C, L)

    # Horner over windows, most significant first (sequential, tiny)
    def horner(acc, w_sum):
        acc = jax.lax.fori_loop(
            0, WINDOW_BITS, lambda _, t: padd(t, t), acc)
        return padd(acc, w_sum), None

    acc0 = jnp.broadcast_to(jnp.asarray(pidentity(())),
                            (*batch, C, N_LIMBS))
    acc, _ = jax.lax.scan(horner, acc0, w_all[::-1])
    return acc


def msm_g1(scalars: jnp.ndarray, points: G1Point) -> G1Point:
    """scalars: (..., n, 16) plain limb form; points: G1Point (n, 16).
    Returns the (batched) MSM result as a projective G1Point."""
    return unpack_g1(_msm_packed(scalars, pack_g1(points), "g1"))


def msm_g2(scalars: jnp.ndarray, points: G2Point) -> G2Point:
    return unpack_g2(_msm_packed(scalars, pack_g2(points), "g2"))

"""Limb-major Pippenger MSM for BN254 G1/G2 (TPU, Pallas-backed).

Replaces ops/msm.py's Blelloch-scan formulation (go-rapidsnark's MSM role,
SURVEY.md §3.3 hot loop #3) with a structure shaped by what measured fast
on v5e:

  * 8-bit windows as a batch axis (all windows' bucket work vectorized);
  * per window: argsort digits, compose the point gather with a
    BIT-REVERSAL so the sum tree's every level is a contiguous
    fold-in-half add — x[..., :m/2] + x[..., m/2:] — which the Pallas
    kernel consumes zero-copy (two BlockSpecs into one buffer).
    Upsweep total: m-1 adds (the minimum for a sum tree);
  * NO downsweep: the 255 bucket-boundary prefix sums are assembled by
    walking root-to-leaf paths over the retained levels (<= log2(m) adds
    per bucket — 255*14 instead of m extra adds per window);
  * bucket counts by vmapped binary search over the sorted digits
    (the old compare-sum built an (lanes, m, 255) tensor);
  * telescoped weighted-bucket identity (sum_b b*S_b = 255*total -
    sum_{b<255} prefix_b) — one 255-leaf tree instead of a bucket walk.

Scalars arrive in limb-major plain form (n, 21, B) int32 with EXACT
canonical limbs (the witness pipeline's output); points are (n, rows)
int32 row tables from ec_lm.g1_table / g2_table.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ec_lm, lm
from .pallas import lm_kernels as K

WBITS = 8
N_WINDOWS = 32
N_BUCKETS = 1 << WBITS


def _next_pow2(n):
    m = 1
    while m < n:
        m *= 2
    return m


@functools.lru_cache(maxsize=None)
def _bitrev(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    br = np.zeros(n, dtype=np.int32)
    for i in range(n):
        br[i] = int(bin(i)[2:].zfill(log_n)[::-1] or "0", 2)
    return br


def _bitrev_traced(k: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Bit-reverse traced int32 values over `bits` bits."""
    out = jnp.zeros_like(k)
    for i in range(bits):
        out = out | (((k >> i) & 1) << (bits - 1 - i))
    return out


def _neg_plane(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    nl = lm.N_LIMBS
    d = jnp.asarray(lm.FQ.sub_d)
    if kind == "g1":
        y = x[..., nl:2 * nl, :]
        neg_y = lm.weak_norm(d - y)
        return jnp.concatenate([x[..., :nl, :], neg_y, x[..., 2 * nl:, :]],
                               axis=-2)
    y = x[..., 2 * nl:4 * nl, :]                 # stacked Fq2 (re, im)
    neg_y = lm.weak_norm(jnp.concatenate([d, d], axis=-2) - y)
    return jnp.concatenate([x[..., :2 * nl, :], neg_y, x[..., 4 * nl:, :]],
                           axis=-2)


def _tree_reduce_lanes(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """(B, rows, m) -> (B, rows, 1) sum over lanes (m a power of two)."""
    while x.shape[-1] > 1:
        x = K.fold_padd(x, kind)
    return x


def _double_k(x: jnp.ndarray, k: int, kind: str) -> jnp.ndarray:
    return jax.lax.fori_loop(0, k, lambda i, v: K.padd(v, v, kind), x)


def msm(scalars_plain: jnp.ndarray, table: jnp.ndarray, kind: str,
        window_group: int | None = None) -> jnp.ndarray:
    """scalars_plain: (n, 21, B) int32 canonical limb-major plain form;
    table: (n, rows) int32 point rows (Montgomery projective).
    Returns (B, rows, 1) packed result planes.

    window_group bounds peak memory (the (G*B, m, rows) point gather):
    sized so G*B <= 128 on TPU (~3 GB peak at m=32k including the
    retained upsweep levels); a single 32-window group elsewhere (CPU
    tests/dry-runs are tiny, and one group keeps the traced program 4x
    smaller)."""
    if window_group is None:
        if K.on_tpu():
            window_group = max(1, min(8, 128 // scalars_plain.shape[-1]))
        else:
            window_group = N_WINDOWS
    rows = table.shape[-1]
    n, B = scalars_plain.shape[0], scalars_plain.shape[-1]
    assert table.shape[0] == n
    m = _next_pow2(n)
    log_m = m.bit_length() - 1

    digits = lm.window_digits(scalars_plain, WBITS, N_WINDOWS)  # (32, n, B)
    digits = jnp.swapaxes(digits, -1, -2)                       # (32, B, n)
    if m != n:
        digits = jnp.concatenate(
            [digits, jnp.zeros((N_WINDOWS, B, m - n), jnp.int32)], axis=-1)
        pad_rows = np.broadcast_to(
            K.identity_plane(kind, (), 1)[:, 0][None, :], (m - n, rows))
        table = jnp.concatenate([table, jnp.asarray(pad_rows)], axis=0)

    br = jnp.asarray(_bitrev(m))
    w_sums = []
    for g0 in range(0, N_WINDOWS, window_group):
        d = digits[g0:g0 + window_group]                # (G, B, m)
        G = d.shape[0]
        order = jnp.argsort(d, axis=-1).astype(jnp.int32)
        d_sorted = jnp.take_along_axis(d, order, axis=-1)
        perm = order[..., br]                           # fold-order gather
        pts = table[perm.reshape(G * B, m)]             # (G*B, m, rows)
        x = jnp.swapaxes(pts, -1, -2)                   # (G*B, rows, m)

        # upsweep (levels[l]: block sums of size 2^l, fold-ordered)
        levels = [x]
        while x.shape[-1] > 1:
            x = K.fold_padd(x, kind)
            levels.append(x)
        total = levels[-1]                              # (G*B, rows, 1)

        # bucket-boundary positions: counts[b] = #{digits <= b}
        buckets = jnp.arange(N_BUCKETS - 1, dtype=jnp.int32)   # 0..254
        counts = jax.vmap(
            lambda row: jnp.searchsorted(row, buckets, side="right"))(
            d_sorted.reshape(G * B, m)).astype(jnp.int32)       # (G*B, 255)
        # pad to 256 lanes with an empty query (count 0 -> identity)
        counts = jnp.concatenate(
            [counts, jnp.zeros((G * B, 1), jnp.int32)], axis=-1)

        # path-gather inclusive prefixes P(counts-1) over the sum tree
        acc = jnp.asarray(K.identity_plane(kind, (G * B,), N_BUCKETS))
        remaining = counts
        offset = jnp.zeros_like(counts)
        for lvl in range(log_m, -1, -1):
            take = (remaining >> lvl) & 1               # (G*B, 256)
            blk = offset >> lvl                         # block index
            src = _bitrev_traced(blk, log_m - lvl)      # fold-order index
            node = jnp.take_along_axis(
                levels[lvl], src[:, None, :], axis=-1)  # (G*B, rows, 256)
            added = K.padd(acc, node, kind)
            acc = jnp.where((take == 1)[:, None, :], added, acc)
            offset = offset + (take << lvl)
        # acc[..., :255] = T_b (prefix sums); lane 255 = identity
        u = _tree_reduce_lanes(acc, kind)               # sum_b T_b

        # W = 255 * total - sum_b T_b
        t255 = K.padd(_double_k(total, WBITS, kind),
                      _neg_plane(total, kind), kind)    # 255 * total
        w = K.padd(t255, _neg_plane(u, kind), kind)     # (G*B, rows, 1)
        w_sums.append(w.reshape(G, B, rows, 1))

    w_all = jnp.concatenate(w_sums, axis=0)             # (32, B, rows, 1)

    # Horner over windows, most significant first (tiny; XLA path)
    fn = ec_lm.padd_g1 if kind == "g1" else ec_lm.padd_g2

    def horner(acc, wv):
        acc = jax.lax.fori_loop(0, WBITS, lambda i, v: fn(v, v), acc)
        return fn(acc, wv), None

    acc0 = jnp.asarray(K.identity_plane(kind, (B,), 1))
    acc, _ = jax.lax.scan(horner, acc0, w_all[::-1])
    return acc

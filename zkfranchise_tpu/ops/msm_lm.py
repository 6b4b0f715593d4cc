"""Limb-major Pippenger MSM for BN254 G1/G2 (TPU, Pallas-backed).

Replaces ops/msm.py's Blelloch-scan formulation (go-rapidsnark's MSM role,
SURVEY.md §3.3 hot loop #3) with a structure shaped by what measured fast
on v5e:

  * 8-bit SIGNED-DIGIT windows (e in [-128, 127], carry-recoded): bucket
    magnitudes are 0..128, so the path-gather/prefix stage runs on 128
    lanes instead of 256 — half the bucket work of unsigned digits.
    Negations are a masked y-negate on the gathered points;
  * per window: argsort digit MAGNITUDES, compose the point gather with
    a BIT-REVERSAL so the sum tree's every level is a contiguous
    fold-in-half add — x[..., :m/2] + x[..., m/2:] — which the Pallas
    kernel consumes zero-copy (two BlockSpecs into one buffer).
    Upsweep total: m-1 adds (the minimum for a sum tree);
  * NO downsweep: the 128 bucket-boundary prefix sums are assembled by
    walking root-to-leaf paths over the retained levels (<= log2(m) adds
    per bucket);
  * bucket counts by vmapped binary search over the sorted magnitudes
    (the old compare-sum built an (lanes, m, buckets) tensor);
  * telescoped weighted-bucket identity (sum_b b*S_b = 128*total -
    sum_{b<128} prefix_b) — one 128-leaf tree instead of a bucket walk.

Scalars arrive in limb-major plain form (n, 21, B) int32 with EXACT
canonical limbs (the witness pipeline's output); points are (n, rows)
int32 AFFINE row tables from ec_affine.affine_table (sign application
gathers from a doubled [P|-P] table; results are projective planes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ec_affine, ec_lm, lm
from .pallas import lm_kernels as K

WBITS = 8
N_WINDOWS = 32
N_MAGS = 1 << (WBITS - 1)       # signed-digit magnitudes 1..128; prefix
                                # queries cover 0..127 (= N_MAGS lanes)


def _signed_digits(digits: jnp.ndarray):
    """(32, B, n) unsigned base-256 digits -> (signs, mags) with the
    signed-digit recoding e_w in [-128, 127]:  e = d + carry;
    e >= 128 -> e -= 256, carry out 1.  Scalars are < 2^254, so window
    31's digit is <= 63 and the final carry is always 0."""
    signs, mags = [], []
    carry = jnp.zeros_like(digits[0])
    for w in range(N_WINDOWS):
        e = digits[w] + carry
        hi = (e >= N_MAGS).astype(jnp.int32)
        e = e - 256 * hi
        carry = hi
        signs.append((e < 0).astype(jnp.int32))
        mags.append(jnp.abs(e))
    return jnp.stack(signs), jnp.stack(mags)


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


def chunk_window_sums(scalars_chunk: jnp.ndarray, table_chunk: jnp.ndarray,
                      kind: str,
                      window_group: int | None = None) -> jnp.ndarray:
    """Per-window signed-bucket sums for ONE pow2-sized chunk.
    scalars_chunk: (m, 21, B) canonical plain (zero-padded to pow2 m);
    table_chunk: (m, arows) affine rows (identity-padded).
    Returns (32, B, rows, 1) projective planes.

    This is the jit unit the DeviceProver dispatches per chunk: its
    program is keyed ONLY by (m, B, kind), so the dominant 8192-point
    program is compiled once and shared by the A / B1 / C MSMs (the r4
    layout compiled one monolithic program per MSM — most of the 330 s
    warm-up)."""
    rows = ec_lm.G1_ROWS if kind == "g1" else ec_lm.G2_ROWS
    m, B = scalars_chunk.shape[0], scalars_chunk.shape[-1]
    assert table_chunk.shape[0] == m and m == _next_pow2(m)
    digits = lm.window_digits(scalars_chunk, WBITS, N_WINDOWS)  # (32, m, B)
    digits = jnp.swapaxes(digits, -1, -2)                       # (32, B, m)
    signs, mags = _signed_digits(digits)
    return _window_sums(signs, mags, table_chunk, kind, window_group,
                        m, rows)


def combine_horner(w_chunks: list, kind: str, B: int) -> jnp.ndarray:
    """[(32, B, rows, 1)] per-chunk window sums -> (B, rows, 1) MSM
    result: add window sums across chunks, then Horner over windows
    (most significant first)."""
    fn = ec_lm.padd_g1 if kind == "g1" else ec_lm.padd_g2
    w_all = w_chunks[0]
    for w in w_chunks[1:]:
        w_all = fn(w_all, w)

    def horner(acc, wv):
        acc = jax.lax.fori_loop(0, WBITS, lambda i, v: fn(v, v), acc)
        return fn(acc, wv), None

    acc0 = jnp.asarray(K.identity_plane(kind, (B,), 1))
    acc, _ = jax.lax.scan(horner, acc0, w_all[::-1])
    return acc


def pad_chunk(scalars: jnp.ndarray, table, start: int, real: int,
              m: int, kind: str):
    """Slice chunk [start, start+real) and pad to pow2 m (zero scalars,
    identity points).  Table padding is usually precomputed (static)."""
    sc = scalars[start:start + real]
    if m != real:
        sc = jnp.concatenate(
            [sc, jnp.zeros((m - real, lm.N_LIMBS, sc.shape[-1]),
                           jnp.int32)], axis=0)
    if table is None:
        return sc, None
    tab = table[start:start + real]
    if m != real:
        tab = jnp.concatenate(
            [tab, jnp.asarray(ec_affine.identity_rows(kind, m - real))],
            axis=0)
    return sc, tab


def msm(scalars_plain: jnp.ndarray, table: jnp.ndarray, kind: str,
        window_group: int | None = None) -> jnp.ndarray:
    """scalars_plain: (n, 21, B) int32 canonical limb-major plain form;
    table: (n, arows) int32 AFFINE point rows (ec_affine.affine_table:
    exact canonical Montgomery coords + inf mask).
    Returns (B, rows, 1) packed PROJECTIVE result planes.

    window_group bounds peak memory (the (G*B, m, rows) point gather):
    sized so G*B <= 128 on TPU (~3 GB peak at m=32k including the
    retained upsweep levels); a single 32-window group elsewhere (CPU
    tests/dry-runs are tiny, and one group keeps the traced program 4x
    smaller).

    pow2-CHUNKING: a single tree pads n to the next power of two (A
    table: 10150 -> 16384, 61% wasted adds); greedy pow2 chunks waste
    < the smallest chunk and their per-window sums combine with one
    padd before the shared Horner."""
    arows = ec_affine.AROWS[kind]
    assert table.shape[-1] == arows, "msm expects an AFFINE table"
    n, B = scalars_plain.shape[0], scalars_plain.shape[-1]
    assert table.shape[0] == n

    ws = []
    for start, real, m in _chunks(n):
        sc, tab = pad_chunk(scalars_plain, table, start, real, m, kind)
        ws.append(chunk_window_sums(sc, tab, kind, window_group))
    return combine_horner(ws, kind, B)


MIN_CHUNK = 2048


def _chunks(n: int):
    """[(start, real, padded)].  At most ONE split: each extra chunk
    re-pays the whole per-window bucket stage (sort, path-gather over
    log m levels, prefix reduce, 128x doubling) — measured on the v5e,
    a 3-way split of the G2 table DOUBLED its MSM time.  Split only
    when padding waste is >= 25% of the padded tree (the A table:
    10150 -> 16384 wastes 38%; split saves ~0.3 s/step at batch=128),
    into one big pow2 half + one padded remainder."""
    m = _next_pow2(n)
    if m - n < max(MIN_CHUNK, m // 4):
        return [(0, n, m)]
    c = m // 2
    return [(0, c, c), (c, n - c, _next_pow2(n - c))]


def _lane_scan_padd(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Inclusive EC prefix-sum over the last axis (width <= 128) via
    log-step SHIFTED adds: every op stays at the full stored width, so
    it runs in the Pallas kernel.  (The width-halving tree's sub-128
    folds hit the rolled-XLA fallback at ~30x kernel cost — measured as
    ~1 s of m-independent per-chunk time at r5.)"""
    w = x.shape[-1]
    s = 1
    while s < w:
        idp = jnp.asarray(K.identity_plane(kind, x.shape[:-2], s))
        shifted = jnp.concatenate([idp, x[..., :-s]], axis=-1)
        x = K.padd(x, shifted, kind)
        s *= 2
    return x


WFLOOR = N_MAGS            # stop the sum tree at width 128


def _window_sums(signs, mags, table, kind, G, m, rows):
    """Per-window signed-bucket sums for one pow2 chunk:
    signs/mags (32, B, m); table (m, arows) affine.
    Returns (32, B, rows, 1) projective planes.

    Structure (m >= 128): sort by magnitude -> affine gather in fold
    order -> upsweep DOWN TO WIDTH 128 only (level 0 is the fused
    aff+aff kernel) -> bit-reversal-unscramble the width-128 coarse
    level and take its inclusive EC prefix scan (shifted adds, full
    width) -> per-bucket prefix = coarse prefix at the bucket's full
    coarse block + fine path walk over the stored levels (all node adds
    at width 128) -> u = scan over bucket prefixes.  total and u leave
    the scan per window; the x128 weighted-total doubling runs ONCE on
    the stacked 32-window plane instead of per window."""
    B = signs.shape[1]
    if G is None:
        # G*B <= 128: measured optimum on the v5e — larger groups
        # (G*B = 256/512) slow every MSM 15-35% (the bigger gather +
        # retained-level working set thrashes HBM harder than the saved
        # scan dispatches are worth).  Additionally cap G*B*m <= 2^24
        # (~2.9 GB point gather at 43 rows): at nlevels=160 the C chunk
        # is m = 262144, where 128 gather lanes would OOM the chip.
        if K.on_tpu():
            lanes_cap = max(1, (1 << 23) // m)
            G = max(1, min(8, 128 // B, lanes_cap // B))
            G = 1 << (G.bit_length() - 1)       # divisor of N_WINDOWS
        else:
            G = N_WINDOWS
    log_m = m.bit_length() - 1
    # doubled table [P | -P]: sign application is a gather offset, not
    # arithmetic.  The gather and the sum tree's LEVEL 0 stay AFFINE:
    # the fused aff+aff->projective kernel (K.fold_padd_aa, RCB15 with
    # Z1=Z2=1) does 10 products instead of 12 on 43-row reads instead
    # of 63 — and level 0 is half of all upsweep adds.  Levels >= 1 run
    # the projective RCB15 fold.
    table_ext = jnp.concatenate(
        [table, jnp.swapaxes(
            ec_affine.neg_affine(jnp.swapaxes(table, 0, 1), kind), 0, 1)],
        axis=0)                                           # (2m, arows)

    br = jnp.asarray(_bitrev(m))
    assert N_WINDOWS % G == 0
    small = m < WFLOOR                 # tiny chunks (tests): full tree
    k = 0 if small else log_m - 7      # coarse block size 2^k

    def sort_gather(sg, d):
        order = jnp.argsort(d, axis=-1).astype(jnp.int32)
        d_sorted = jnp.take_along_axis(d, order, axis=-1)
        perm = order[..., br]                           # fold-order gather
        sg_fold = jnp.take_along_axis(sg, perm, axis=-1)
        idx = (perm + m * sg_fold).reshape(G * B, m)    # signed: 2nd half
        pts = table_ext[idx]                            # (G*B, m, arows)
        x = jnp.swapaxes(pts, -1, -2)                   # (G*B, arows, m)
        buckets = jnp.arange(N_MAGS, dtype=jnp.int32)
        counts = jax.vmap(
            lambda row: jnp.searchsorted(row, buckets, side="right"))(
            d_sorted.reshape(G * B, m)).astype(jnp.int32)   # (G*B, 128)
        return x, counts

    def upsweep(x, floor):
        """fold until width == floor; level 0 stays affine."""
        levels = [x]
        if x.shape[-1] > floor:
            x = K.fold_padd_aa(x, kind)                 # -> projective
            levels.append(x)
        while x.shape[-1] > floor:
            x = K.fold_padd(x, kind)
            levels.append(x)
        return levels

    def fine_walk(levels, acc, counts, offset0, top_lvl):
        """Root-to-leaf path adds for levels < top_lvl (width-128 ops)."""
        offset = offset0
        for lvl in range(top_lvl - 1, -1, -1):
            take = (counts >> lvl) & 1                  # (G*B, 128)
            blk = offset >> lvl                         # block index
            src = _bitrev_traced(blk, log_m - lvl)      # fold-order index
            node = jnp.take_along_axis(
                levels[lvl], src[:, None, :], axis=-1)  # (G*B, rows, 128)
            if lvl == 0 and levels[0].shape[-2] != rows:
                node = ec_affine.to_projective(node, kind)
            added = K.padd(acc, node, kind)
            acc = jnp.where((take == 1)[:, None, :], added, acc)
            offset = offset + (take << lvl)
        return acc

    def group_body_small(_, sd):
        """Full tree to width 1 (m < 128: CPU tests / tiny chunks)."""
        sg, d = sd
        x, counts = sort_gather(sg, d)
        levels = upsweep(x, 1)
        if levels[-1].shape[-2] != rows:                # m == 1
            levels[-1] = ec_affine.to_projective(levels[-1], kind)
        total = levels[-1]
        acc = jnp.asarray(K.identity_plane(kind, (G * B,), N_MAGS))
        acc = fine_walk(levels, acc, counts, jnp.zeros_like(counts),
                        log_m + 1)
        u = _tree_reduce_lanes(acc, kind)
        return None, (total.reshape(G, B, rows, 1),
                      u.reshape(G, B, rows, 1))

    def group_body(_, sd):
        """sd: (signs, mags) each (G, B, m) for one window group
        -> (total, u) each (G, B, rows, 1).  Runs under lax.scan so the
        (large) bucket-accumulation program is traced ONCE regardless
        of the group count."""
        sg, d = sd
        x, counts = sort_gather(sg, d)
        levels = upsweep(x, WFLOOR)
        coarse = levels[-1]                             # width 128
        if coarse.shape[-2] != rows:                    # m == 128: affine
            coarse = ec_affine.to_projective(coarse, kind)
        # storage position j holds sorted block bitrev7(j): unscramble,
        # then inclusive prefix over sorted coarse blocks
        br7 = jnp.asarray(_bitrev(WFLOOR))
        cs = jnp.take_along_axis(
            coarse, jnp.broadcast_to(br7, coarse.shape[:-1]
                                     + (WFLOOR,)), axis=-1)
        cp = _lane_scan_padd(cs, kind)                  # (G*B, rows, 128)
        total = cp[..., -1:]

        # per-bucket prefix: q full coarse blocks + fine remainder
        q = counts >> k                                 # (G*B, 128)
        node_c = jnp.take_along_axis(
            cp, jnp.maximum(q - 1, 0)[:, None, :], axis=-1)
        idp = jnp.asarray(K.identity_plane(kind, (G * B,), N_MAGS))
        acc = jnp.where((q >= 1)[:, None, :], node_c, idp)
        acc = fine_walk(levels, acc, counts & ((1 << k) - 1),
                        (q << k) if k else jnp.zeros_like(q), k)
        # u = sum_b T_b over the 128 bucket lanes
        u = _lane_scan_padd(acc, kind)[..., -1:]
        return None, (total.reshape(G, B, rows, 1),
                      u.reshape(G, B, rows, 1))

    shape_g = (N_WINDOWS // G, G, B, m)
    _, (totals, us) = jax.lax.scan(
        group_body_small if small else group_body, None,
        (signs.reshape(shape_g), mags.reshape(shape_g)))
    totals = totals.reshape(N_WINDOWS, B, rows, 1)
    us = us.reshape(N_WINDOWS, B, rows, 1)

    # W_w = 128 * total_w - u_w, computed across ALL windows at once:
    # windows ride the lane axis (width 32 Pallas ops) instead of seven
    # width-1 doublings inside every scan iteration
    tw = jnp.moveaxis(totals[..., 0], 0, -1)            # (B, rows, 32)
    uw = jnp.moveaxis(us[..., 0], 0, -1)
    t128 = _double_k(tw, WBITS - 1, kind)
    w = K.padd(t128, _neg_plane(uw, kind), kind)        # (B, rows, 32)
    return jnp.moveaxis(w, -1, 0)[..., None]            # (32, B, rows, 1)

"""Limb-major EC arithmetic for BN254 G1/G2 (packed plane layout).

Points are homogeneous projective (X:Y:Z), coordinates in Montgomery form
over the 21x13 limb-major core (ops/lm.py):

  * G1 point plane: (..., 63, T) int32 — rows [0:21) X, [21:42) Y,
    [42:63) Z; T elements ride the lanes.
  * G2 point plane: (..., 126, T) — each Fq2 coordinate is two stacked
    21-row Fq values (re, im).

The complete addition formulas (Renes–Costello–Batina 2015, Algorithm 7,
a=0) are branch-free, so one function covers add/double/identity — the
right shape for both Pallas kernel bodies and plain XLA (the functions
run under either; see ops/pallas/lm_kernels.py for the kernel wrappers).

Replaces the curve arithmetic inside go-rapidsnark/snarkjs (SURVEY.md §2b;
consumed at /root/reference/zk_census_test.go:89).  Host oracle: ops/ec.py.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import ec, ff, lm

NL = lm.N_LIMBS                       # 21
G1_ROWS = 3 * NL                      # 63
G2_ROWS = 6 * NL                      # 126


# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

_R = 1 << lm.R_BITS
_Q = ff.P_FQ


def _mont_col(x: int) -> np.ndarray:
    return lm.int_to_limbs(x * _R % _Q)[:, None].astype(np.int32)


@functools.lru_cache(maxsize=None)
def b3_g1() -> np.ndarray:
    return _mont_col(9)               # 3*b, b = 3


@functools.lru_cache(maxsize=None)
def b3_g2() -> np.ndarray:
    """(42, 1): Fq2 3*b' for the twist, stacked (re, im)."""
    b3 = ec.fq2_scalar(ec.B2, 3)
    return np.concatenate([_mont_col(b3[0]), _mont_col(b3[1])], axis=0)


EC_CONST_ROWS = lm.N_CONST_ROWS + 3          # 5 field rows + b3g1 + b3g2


def pack_ec_consts(tile: int = 1) -> np.ndarray:
    """(8*21, tile) int32 constants block for kernels: 5 FQ field rows
    + b3_g1 + b3_g2 (re, im), all materialized at lane width `tile`
    (in-kernel slices of lane-broadcasts don't lower on Mosaic)."""
    col = np.concatenate(
        [lm.pack_consts(lm.FQ), b3_g1(), b3_g2()], axis=0)   # (168, 1)
    return np.broadcast_to(col, (EC_CONST_ROWS * NL, tile)).copy().astype(
        np.int32)


def unpack_ec_consts(c):
    """-> (KernelField, b3g1 (21, T), b3g2 (42, T))."""
    f = lm.N_CONST_ROWS
    fs = lm.unpack_consts(c[..., :f * NL, :])
    b31 = c[..., f * NL:(f + 1) * NL, :]
    b32 = c[..., (f + 1) * NL:(f + 3) * NL, :]
    return fs, b31, b32


# ---------------------------------------------------------------------------
# Fq / Fq2 helpers on STACKED plane slices
# ---------------------------------------------------------------------------
# The complete-addition formula needs 12 Fq (or 12 Fq2) products; they have
# a 3-round dependence structure, so each point-add issues exactly THREE
# batched mont_mul calls over a leading stack axis — an order of magnitude
# fewer traced call sites than one call per product (the dominant factor in
# both XLA compile time and while-loop dispatch overhead off-TPU), and
# wider VPU ops inside Pallas kernels.

def _mul_stack_fq(lhs, rhs, fs, b3):
    """lhs/rhs: list of (..., 21, T) -> list of products (one mont call)."""
    v = lm.mont_mul(jnp.stack(lhs, axis=-3), jnp.stack(rhs, axis=-3), fs)
    return [v[..., i, :, :] for i in range(len(lhs))]


def _mul_stack_fq2(lhs, rhs, fs, b3):
    """lhs/rhs: list of (..., 42, T) Fq2 planes -> list of Fq2 products.
    Schoolbook with LAZY REDUCTION: 4 wide products but only 2 Montgomery
    reductions per Fq2 product (the component sums happen on the wide
    column form, pre-reduce) — ~30% fewer mul-ops than 4 full mont_muls.

      re = reduce( a0*b0 + a1*(D2 - b1) )        (D2 - b1 ≡ -b1 mod p)
      im = reduce( a0*b1 + a1*b0 )

    Budgets: operands are < 2^258.6 (g2 padd intermediates), so the
    negation uses sub_d2 (dominates < 2^259); T0 for the reduce is then
    < 2^518, far inside mont_reduce's R*2^257 carry-trick budget, and
    both output components come out < p + 2^246 < 2^255 — TIGHTER than
    the old sub_d1 formulation (the round-3 G2 bug class gets more
    margin, not less).  The raw wide columns are weak-normalized before
    pairwise summation (two raw wides would overflow int32)."""
    S = len(lhs)
    a = jnp.stack(lhs, axis=-3)          # (..., S, 42, T)
    b = jnp.stack(rhs, axis=-3)
    a0, a1 = a[..., :NL, :], a[..., NL:, :]
    b0, b1 = b[..., :NL, :], b[..., NL:, :]
    nb1 = lm.weak_norm(jnp.asarray(fs.sub_d2) - b1)
    big_l = jnp.stack([a0, a1, a0, a1], axis=-3)   # (..., S, 4, 21, T)
    big_r = jnp.stack([b0, nb1, b1, b0], axis=-3)
    w = lm.weak_norm(lm.wide_mul(big_l, big_r), 2)  # (..., S, 4, 43, T)
    re = lm.mont_reduce(w[..., 0, :, :] + w[..., 1, :, :], fs)
    im = lm.mont_reduce(w[..., 2, :, :] + w[..., 3, :, :], fs)
    out = jnp.concatenate([re, im], axis=-2)       # (..., S, 42, T)
    return [out[..., i, :, :] for i in range(S)]


def _fq_sub_n(a, b, fs):
    return lm.weak_norm(a + (jnp.asarray(fs.sub_d) - b))


def _fq2_sub_n(a, b, fs):
    d = jnp.asarray(fs.sub_d)
    dd = jnp.concatenate([d, d], axis=-2)
    return lm.weak_norm(a + (dd - b))


# ---------------------------------------------------------------------------
# complete addition (RCB15 Algorithm 7, a = 0)
# ---------------------------------------------------------------------------

def _round3_fq(t3, t4, y3b, t1, z3, x3, fs, b3):
    """RCB15 round 3 over Fq with LAZY REDUCTION: the three output
    combinations x3 = t3*t1 - t4*y3b, y3 = y3b*x3 + t1*z3,
    z3 = z3*t4 + x3*t3 happen on the wide column form — 6 wide products
    and 3 Montgomery reductions instead of 6 full mont_muls (~15% of
    the whole padd's mul-ops).  The subtraction negates pre-product
    against sub_d2 (dominates every round-3 operand, all < 2^257.2);
    T0 < 2^518 << the R*2^257 reduce budget, and outputs come out
    < p + 2^246 — tighter than the reduced-then-subtracted form."""
    wn = lm.weak_norm
    ny3b = wn(jnp.asarray(fs.sub_d2) - y3b)
    L = jnp.stack([t3, t4, y3b, t1, z3, x3], axis=-3)
    R = jnp.stack([t1, ny3b, x3, z3, t4, t3], axis=-3)
    w = wn(lm.wide_mul(L, R), 2)
    x3o = lm.mont_reduce(w[..., 0, :, :] + w[..., 1, :, :], fs)
    y3o = lm.mont_reduce(w[..., 2, :, :] + w[..., 3, :, :], fs)
    z3o = lm.mont_reduce(w[..., 4, :, :] + w[..., 5, :, :], fs)
    return x3o, y3o, z3o


def _round3_fq2(t3, t4, y3b, t1, z3, x3, fs, b3):
    """RCB15 round 3 over Fq2, fully lazy: the three Fq2 combinations
    (x3 = T3·T1 − T4·Y3b, y3 = Y3b·X3 + T1·Z3, z3 = Z3·T4 + X3·T3)
    expand to 24 wide Fq products and SIX Montgomery reductions (one per
    output component) instead of 24 wides + 12 reductions.  Signs fold
    into pre-product sub_d2 negations; each reduction input is a sum of
    four weak-normalized wides (columns < 2^15.1, T0 < 2^519 << the
    R*2^257 reduce budget); outputs < p + 2^246."""
    wn = lm.weak_norm
    d2 = jnp.asarray(fs.sub_d2)

    def sp(v):
        return v[..., :NL, :], v[..., NL:, :]

    def n2(v):
        return wn(d2 - v)

    L, R = [], []
    for a, b, c, d, minus in (
            (t3, t1, t4, y3b, True),     # x3o = A·B − C·D
            (y3b, x3, t1, z3, False),    # y3o = A·B + C·D
            (z3, t4, x3, t3, False)):    # z3o = A·B + C·D
        a0, a1 = sp(a)
        b0, b1 = sp(b)
        c0, c1 = sp(c)
        d0, d1 = sp(d)
        # re: (a0b0 - a1b1) ± (c0d0 - c1d1)
        L += [a0, a1, c0, c1]
        R += [b0, n2(b1)] + ([n2(d0), d1] if minus else [d0, n2(d1)])
        # im: (a0b1 + a1b0) ± (c0d1 + c1d0)
        L += [a0, a1, c0, c1]
        R += [b1, b0] + ([n2(d1), n2(d0)] if minus else [d1, d0])
    w = wn(lm.wide_mul(jnp.stack(L, axis=-3), jnp.stack(R, axis=-3)), 2)
    outs = []
    for i in range(3):
        o = i * 8
        re = lm.mont_reduce(w[..., o + 0, :, :] + w[..., o + 1, :, :] +
                            w[..., o + 2, :, :] + w[..., o + 3, :, :], fs)
        im = lm.mont_reduce(w[..., o + 4, :, :] + w[..., o + 5, :, :] +
                            w[..., o + 6, :, :] + w[..., o + 7, :, :], fs)
        outs.append(jnp.concatenate([re, im], axis=-2))
    return tuple(outs)


def _round3_generic(t3, t4, y3b, t1, z3, x3, fs, b3, mul_stack, fsub_n):
    q = mul_stack([t3, t4, y3b, t1, z3, x3],
                  [t1, y3b, x3, z3, t4, t3], fs, b3)
    return (fsub_n(q[0], q[1], fs), lm.weak_norm(q[2] + q[3]),
            lm.weak_norm(q[4] + q[5]))


def _padd(x1, y1, z1, x2, y2, z2, mul_stack, fsub_n, b3, fs):
    """RCB15 Algorithm 7 (a = 0) in three batched product rounds.  All
    sums/differences are weak-normalized before entering a product or a
    spread subtraction."""
    wn = lm.weak_norm
    # round 1: 6 independent products
    lhs = [x1, y1, z1, wn(x1 + y1), wn(y1 + z1), wn(x1 + z1)]
    rhs = [x2, y2, z2, wn(x2 + y2), wn(y2 + z2), wn(x2 + z2)]
    t0, t1, t2, pa, pb, pc = mul_stack(lhs, rhs, fs, b3)
    t3 = fsub_n(pa, wn(t0 + t1), fs)                # X1Y2 + X2Y1
    t4 = fsub_n(pb, wn(t1 + t2), fs)                # Y1Z2 + Y2Z1
    y3 = fsub_n(pc, wn(t0 + t2), fs)                # X1Z2 + X2Z1
    x3 = wn(t0 + t0 + t0)                           # 3*X1X2
    # round 2: the two b3 scalings
    b3b = jnp.broadcast_to(b3, t2.shape)
    t2b, y3b = mul_stack([t2, y3], [b3b, b3b], fs, b3)
    z3 = wn(t1 + t2b)
    t1 = fsub_n(t1, t2b, fs)
    # round 3: 6 products (lazy-reduced in the Fq case)
    if mul_stack is _mul_stack_fq:
        return _round3_fq(t3, t4, y3b, t1, z3, x3, fs, b3)
    if mul_stack is _mul_stack_fq2:
        return _round3_fq2(t3, t4, y3b, t1, z3, x3, fs, b3)
    return _round3_generic(t3, t4, y3b, t1, z3, x3, fs, b3,
                           mul_stack, fsub_n)


def _padd_aa(x1, y1, x2, y2, mul_stack, fsub_n, b3, fs):
    """RCB15 Algorithm 7 (a = 0) specialized to Z1 = Z2 = 1 (two AFFINE
    inputs): 10 products instead of 12, and the Z-row reads disappear.
    Identity inputs are NOT covered (affine planes carry them as a mask
    row — callers select); doubling and P + (-P) are exact.

    Budget note: every operand here is <= the corresponding operand of
    the general _padd (affine coords are exact canonical < p; t4/y3
    are one-add sums of canonical values, weak-normalized), so the
    invariants in ops/lm.py's amplitude rules carry over unchanged."""
    wn = lm.weak_norm
    t0, t1, pa = mul_stack([x1, y1, wn(x1 + y1)],
                           [x2, y2, wn(x2 + y2)], fs, b3)
    t3 = fsub_n(pa, wn(t0 + t1), fs)                # X1Y2 + X2Y1
    t4 = wn(y1 + y2)                                # Y1Z2 + Y2Z1
    y3 = wn(x1 + x2)                                # X1Z2 + X2Z1
    x3 = wn(t0 + t0 + t0)
    b3b = jnp.broadcast_to(b3, t1.shape)
    (y3b,) = mul_stack([y3], [b3b], fs, b3)
    z3 = wn(t1 + b3b)                               # Z1Z2 = 1: t2b = b3
    t1 = fsub_n(t1, b3b, fs)
    if mul_stack is _mul_stack_fq:
        return _round3_fq(t3, t4, y3b, t1, z3, x3, fs, b3)
    if mul_stack is _mul_stack_fq2:
        return _round3_fq2(t3, t4, y3b, t1, z3, x3, fs, b3)
    return _round3_generic(t3, t4, y3b, t1, z3, x3, fs, b3,
                           mul_stack, fsub_n)


def _aa_split(p, k):
    """(..., 2k*21+1, T) affine plane -> (x, y, inf_row)."""
    return (p[..., :k * NL, :], p[..., k * NL:2 * k * NL, :],
            p[..., 2 * k * NL:, :])


def padd_aa(p, q, kind, fs=lm.FQ, b31=None, b32=None):
    """p, q: (..., arows, T) AFFINE planes (ec_affine layout: exact
    canonical coords + inf mask row) -> (..., rows, T) PROJECTIVE plane.
    Complete: identity lanes resolved by mask selection."""
    k = 1 if kind == "g1" else 2
    if k == 1:
        b3 = jnp.asarray(b3_g1()) if b31 is None else b31
        mul_stack, fsub = _mul_stack_fq, _fq_sub_n
    else:
        b3 = jnp.asarray(b3_g2()) if b32 is None else b32
        mul_stack, fsub = _mul_stack_fq2, _fq2_sub_n
    x1, y1, i1 = _aa_split(p, k)
    x2, y2, i2 = _aa_split(q, k)
    x3, y3, z3 = _padd_aa(x1, y1, x2, y2, mul_stack, fsub, b3, fs)

    one = jnp.broadcast_to(jnp.asarray(fs.one_mont),
                           (*y1.shape[:-2], NL, y1.shape[-1]))
    onek = one if k == 1 else jnp.concatenate(
        [one, jnp.zeros_like(one)], axis=-2)
    inf1, inf2 = (i1 == 1), (i2 == 1)
    both = inf1 & inf2
    xo = jnp.where(both, 0, jnp.where(inf1, x2, jnp.where(inf2, x1, x3)))
    yo = jnp.where(both, onek,
                   jnp.where(inf1, y2, jnp.where(inf2, y1, y3)))
    zo = jnp.where(both, 0,
                   jnp.where(inf1 | inf2, onek, z3))
    return jnp.concatenate([xo, yo, zo], axis=-2)


def _g1_coords(p):
    return p[..., :NL, :], p[..., NL:2 * NL, :], p[..., 2 * NL:, :]


def padd_g1(p, q, fs=lm.FQ, b3=None):
    """p, q: (..., 63, T) -> (..., 63, T); complete (handles identity &
    doubling).  Outputs normalized (limbs <= 2^13 + eps)."""
    if b3 is None:
        b3 = jnp.asarray(b3_g1())
    x1, y1, z1 = _g1_coords(p)
    x2, y2, z2 = _g1_coords(q)
    x3, y3, z3 = _padd(x1, y1, z1, x2, y2, z2,
                       _mul_stack_fq, _fq_sub_n, b3, fs)
    return jnp.concatenate([x3, y3, z3], axis=-2)


def _g2_coords(p):
    return (p[..., :2 * NL, :], p[..., 2 * NL:4 * NL, :],
            p[..., 4 * NL:, :])


def padd_g2(p, q, fs=lm.FQ, b3=None):
    """p, q: (..., 126, T) -> (..., 126, T)."""
    if b3 is None:
        b3 = jnp.asarray(b3_g2())

    x1, y1, z1 = _g2_coords(p)
    x2, y2, z2 = _g2_coords(q)
    # _padd with Fq2 ops (weak_norm / add work rowwise on both halves)
    x3, y3, z3 = _padd(x1, y1, z1, x2, y2, z2,
                       _mul_stack_fq2, _fq2_sub_n, b3, fs)
    return jnp.concatenate([x3, y3, z3], axis=-2)


# ---------------------------------------------------------------------------
# identities / selection
# ---------------------------------------------------------------------------

def g1_identity_plane(batch, T) -> np.ndarray:
    out = np.zeros((*batch, G1_ROWS, T), np.int32)
    out[..., NL:2 * NL, :] = lm.FQ.one_mont
    return out


def g2_identity_plane(batch, T) -> np.ndarray:
    out = np.zeros((*batch, G2_ROWS, T), np.int32)
    out[..., 2 * NL:3 * NL, :] = lm.FQ.one_mont
    return out


# ---------------------------------------------------------------------------
# host conversions
# ---------------------------------------------------------------------------

def g1_table(points: list) -> np.ndarray:
    """Affine host points [(x, y) | None] -> (N, 63) int32 row table in
    Montgomery projective form (row layout matches the plane layout after
    a transpose)."""
    n = len(points)
    out = np.zeros((n, G1_ROWS), np.int32)
    for j, pt in enumerate(points):
        if pt is None:
            out[j, NL:2 * NL] = lm.FQ.one_mont[:, 0]
        else:
            out[j, :NL] = lm.int_to_limbs(pt[0] * _R % _Q)
            out[j, NL:2 * NL] = lm.int_to_limbs(pt[1] * _R % _Q)
            out[j, 2 * NL:] = lm.int_to_limbs(_R % _Q)
    return out


def g2_table(points: list) -> np.ndarray:
    n = len(points)
    out = np.zeros((n, G2_ROWS), np.int32)
    one = lm.int_to_limbs(_R % _Q)
    for j, pt in enumerate(points):
        if pt is None:
            out[j, 2 * NL:3 * NL] = one
        else:
            (x0, x1), (y0, y1) = pt[0], pt[1]
            out[j, 0 * NL:1 * NL] = lm.int_to_limbs(x0 * _R % _Q)
            out[j, 1 * NL:2 * NL] = lm.int_to_limbs(x1 * _R % _Q)
            out[j, 2 * NL:3 * NL] = lm.int_to_limbs(y0 * _R % _Q)
            out[j, 3 * NL:4 * NL] = lm.int_to_limbs(y1 * _R % _Q)
            out[j, 4 * NL:5 * NL] = one
    return out


def g1_plane_to_affine(plane) -> list:
    """(..., 63, T) device plane -> list of affine (x, y) | None."""
    x = lm.lm_to_ints(np.asarray(lm.from_mont(plane[..., :NL, :], lm.FQ)))
    y = lm.lm_to_ints(np.asarray(
        lm.from_mont(plane[..., NL:2 * NL, :], lm.FQ)))
    z = lm.lm_to_ints(np.asarray(lm.from_mont(plane[..., 2 * NL:, :], lm.FQ)))
    out = []
    for xi, yi, zi in zip(x, y, z):
        if zi == 0:
            out.append(None)
        else:
            zinv = ff.inv_mod(zi, _Q)
            out.append((xi * zinv % _Q, yi * zinv % _Q))
    return out


def g2_plane_to_affine(plane) -> list:
    c = [lm.lm_to_ints(np.asarray(lm.from_mont(
        plane[..., i * NL:(i + 1) * NL, :], lm.FQ))) for i in range(6)]
    out = []
    for k in range(len(c[0])):
        zt = (c[4][k], c[5][k])
        if zt == (0, 0):
            out.append(None)
            continue
        zinv = ec.fq2_inv(zt)
        xt = ec.fq2_mul((c[0][k], c[1][k]), zinv)
        yt = ec.fq2_mul((c[2][k], c[3][k]), zinv)
        out.append((xt, yt))
    return out

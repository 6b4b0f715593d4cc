"""Batch-affine EC addition for the MSM sum-tree upsweep.

The MSM's dominant cost is the per-window fold tree (m-1 adds per
window).  Projective RCB15 costs 12 field muls on 3-coordinate planes;
affine addition costs ~9 mul-equivalents on 2-coordinate planes with the
division amortized by Montgomery batch inversion across lanes
(K.batch_inv — one Fermat chain per fold level).  Net ~1.7x on G1 and
more on G2 (the Fq2 inverse reduces to ONE Fq batch inversion of the
norm).

Exactness discipline that makes this safe on redundant limb arithmetic:
every affine coordinate this module produces is the EXACT canonical
Montgomery representative (value < p, exact 13-bit limbs) — one
tightening multiply by one_mont + exact carry + conditional subtract per
output component.  Canonical coordinates make the exceptional-case tests
pure limb comparisons:
    equal-x:    all limbs equal;
    opposite:   norm_exact(y1 + y2) == p per component (y == 0 cannot
                occur for real points: G1/G2 have prime order, no
                2-torsion; all-zero pairs are treated as opposite, which
                only arises on masked lanes);
    infinity:   explicit 0/1 mask row carried with the plane.
All complete-addition cases (add, double, P + (-P) = inf, inf operands)
are handled exactly — no probabilistic distinct-points assumption.

Plane layouts ((..., rows, T) int32, Montgomery form):
    G1 affine: rows [0:21) x | [21:42) y | row 42 inf mask   (43 rows)
    G2 affine: [0:42) x (re,im) | [42:84) y | row 84 inf     (85 rows)

The reference delegates all of this to go-rapidsnark's Go arithmetic
(/root/reference/zk_census_test.go:89); this module is the TPU shape of
its bucket-accumulation inner loop.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import ff, lm
from .pallas import lm_kernels as K

NL = lm.N_LIMBS
FQ = lm.FQ
G1_AROWS = 2 * NL + 1        # 43
G2_AROWS = 4 * NL + 1        # 85
AROWS = {"g1": G1_AROWS, "g2": G2_AROWS}
_R = 1 << lm.R_BITS
_Q = ff.P_FQ


# ---------------------------------------------------------------------------
# tables / conversions
# ---------------------------------------------------------------------------

def g1_affine_table(points: list) -> np.ndarray:
    """Affine host points [(x, y) | None] -> (N, 43) int32 rows."""
    n = len(points)
    out = np.zeros((n, G1_AROWS), np.int32)
    for j, pt in enumerate(points):
        if pt is None:
            out[j, 2 * NL] = 1
        else:
            out[j, :NL] = lm.int_to_limbs(pt[0] * _R % _Q)
            out[j, NL:2 * NL] = lm.int_to_limbs(pt[1] * _R % _Q)
    return out


def g2_affine_table(points: list) -> np.ndarray:
    n = len(points)
    out = np.zeros((n, G2_AROWS), np.int32)
    for j, pt in enumerate(points):
        if pt is None:
            out[j, 4 * NL] = 1
        else:
            (x0, x1), (y0, y1) = pt
            for k, v in enumerate((x0, x1, y0, y1)):
                out[j, k * NL:(k + 1) * NL] = lm.int_to_limbs(v * _R % _Q)
    return out


def affine_table(points: list, kind: str) -> np.ndarray:
    return g1_affine_table(points) if kind == "g1" \
        else g2_affine_table(points)


def identity_rows(kind: str, n: int) -> np.ndarray:
    out = np.zeros((n, AROWS[kind]), np.int32)
    out[:, AROWS[kind] - 1] = 1
    return out


def _split(a: jnp.ndarray, kind: str):
    k = 1 if kind == "g1" else 2
    return (a[..., :k * NL, :], a[..., k * NL:2 * k * NL, :],
            a[..., 2 * k * NL:, :])


def to_projective(a: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Affine plane -> packed projective plane (ec_lm layout).
    Infinity lanes map to (0 : 1 : 0)."""
    x, y, inf = _split(a, kind)
    k = 1 if kind == "g1" else 2
    one = jnp.broadcast_to(jnp.asarray(FQ.one_mont),
                           (*y.shape[:-2], NL, y.shape[-1]))
    if k == 1:
        onek = one
    else:
        onek = jnp.concatenate(
            [one, jnp.zeros_like(one)], axis=-2)
    m = (inf == 1)
    z = jnp.where(m, 0, onek)
    y = jnp.where(m, onek, y)
    x = jnp.where(m, 0, x)
    return jnp.concatenate([x, y, z], axis=-2)


# ---------------------------------------------------------------------------
# canonical tightening + exact tests
# ---------------------------------------------------------------------------

def _canon(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-form redundant rep (value < 2^258) -> EXACT canonical
    representative [0, p): multiply by one_mont (same residue, tight),
    resolve carries, conditional subtract."""
    t = K.mont_mul(a, jnp.asarray(FQ.one_mont), FQ)
    return lm._cond_sub_p(lm.norm_exact(t), FQ)


def _canon_k(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-Fq-component canonicalization of a k-component plane."""
    if k == 1:
        return _canon(a)
    sh = (*a.shape[:-2], k, NL, a.shape[-1])
    return _canon(a.reshape(sh)).reshape(a.shape)


def _eq_rows(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """exact canonical planes -> (.., 1, T) bool all-limbs-equal."""
    return jnp.all(a == b, axis=-2, keepdims=True)


def _is_neg_pair(y1: jnp.ndarray, y2: jnp.ndarray, k: int) -> jnp.ndarray:
    """y2 == -y1 mod p per component, for exact canonical y.  All-zero
    component pairs count as opposite (only masked lanes)."""
    p_col = jnp.asarray(FQ.p_limbs)
    s = lm.norm_exact(y1 + y2)
    out = None
    for i in range(k):
        comp = s[..., i * NL:(i + 1) * NL, :]
        yi1 = y1[..., i * NL:(i + 1) * NL, :]
        yi2 = y2[..., i * NL:(i + 1) * NL, :]
        zero = jnp.all((yi1 == 0) & (yi2 == 0), axis=-2, keepdims=True)
        isp = jnp.all(comp == p_col, axis=-2, keepdims=True)
        o = isp | zero
        out = o if out is None else (out & o)
    return out


def neg_affine(a: jnp.ndarray, kind: str) -> jnp.ndarray:
    """-P: y -> p - y, output exact canonical (0 stays 0 via _canon)."""
    x, y, inf = _split(a, kind)
    k = 1 if kind == "g1" else 2
    d = jnp.asarray(FQ.sub_d)
    dk = d if k == 1 else jnp.concatenate([d, d], axis=-2)
    ny = _canon_k(lm.weak_norm(dk - y), k)
    return jnp.concatenate([x, ny, inf], axis=-2)


# ---------------------------------------------------------------------------
# Fq2 helpers (kernel-backed muls)
# ---------------------------------------------------------------------------

def _fq2_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(.., 42, T) x (.., 42, T) -> (.., 42, T); re < 2^256 (tight
    sub_d1 constant — same budget rules as ec_lm._mul_stack_fq2)."""
    a0, a1 = a[..., :NL, :], a[..., NL:, :]
    b0, b1 = b[..., :NL, :], b[..., NL:, :]
    big_l = jnp.stack([a0, a1, a0, a1], axis=-3)
    big_r = jnp.stack([b0, b1, b1, b0], axis=-3)
    v = K.mont_mul(big_l, big_r, FQ)
    re = lm.weak_norm(v[..., 0, :, :] +
                      (jnp.asarray(FQ.sub_d1) - v[..., 1, :, :]))
    im = lm.weak_norm(v[..., 2, :, :] + v[..., 3, :, :])
    return jnp.concatenate([re, im], axis=-2)


def _fq2_sub_n(a, b):
    d = jnp.asarray(FQ.sub_d)
    dd = jnp.concatenate([d, d], axis=-2)
    return lm.weak_norm(a + (dd - b))


# ---------------------------------------------------------------------------
# batch-affine fold: out[j] = x[j] (+) x[j + m/2]
# ---------------------------------------------------------------------------

def fold_affine(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """(B, arows, m) affine planes (exact canonical coords) ->
    (B, arows, m/2) affine, exact canonical.  Complete."""
    k = 1 if kind == "g1" else 2
    h = x.shape[-1] // 2
    a, b = x[..., :h], x[..., h:]
    x1, y1, i1 = _split(a, kind)
    x2, y2, i2 = _split(b, kind)

    eq_x = _eq_rows(x1, x2)
    opp = _is_neg_pair(y1, y2, k)
    inf1, inf2 = (i1 == 1), (i2 == 1)
    either_inf = inf1 | inf2
    dbl = eq_x & ~opp & ~either_inf
    degen = either_inf | (eq_x & opp)

    if k == 1:
        sqr = K.mont_mul(x1, x1, FQ)
        sub_c = lambda u, v: lm.sub_n(u, v, FQ)
        mul = lambda u, v: K.mont_mul(u, v, FQ)
        one_k = jnp.broadcast_to(jnp.asarray(FQ.one_mont),
                                 (*y1.shape[:-2], NL, y1.shape[-1]))
    else:
        sqr = _fq2_mul(x1, x1)
        sub_c = _fq2_sub_n
        mul = _fq2_mul
        one1 = jnp.broadcast_to(jnp.asarray(FQ.one_mont),
                                (*y1.shape[:-2], NL, y1.shape[-1]))
        one_k = jnp.concatenate([one1, jnp.zeros_like(one1)], axis=-2)

    num = jnp.where(dbl, lm.weak_norm(sqr + sqr + sqr), sub_c(y2, y1))
    den = jnp.where(dbl, lm.weak_norm(y1 + y1), sub_c(x2, x1))
    den = jnp.where(degen, one_k, den)

    if k == 1:
        dinv = K.batch_inv(den, FQ)
    else:
        d0, d1 = den[..., :NL, :], den[..., NL:, :]
        nrm = lm.weak_norm(K.mont_mul(d0, d0, FQ) + K.mont_mul(d1, d1, FQ))
        nrm = jnp.where(degen, jnp.asarray(FQ.one_mont), nrm)
        ninv = K.batch_inv(nrm, FQ)
        dinv = jnp.concatenate(
            [K.mont_mul(d0, ninv, FQ),
             lm.neg_n(K.mont_mul(d1, ninv, FQ), FQ)], axis=-2)

    lam = mul(num, dinv)
    lam2 = mul(lam, lam)
    x3 = _canon_k(sub_c(sub_c(lam2, x1), x2), k)
    y3 = _canon_k(sub_c(mul(lam, sub_c(x1, x3)), y1), k)

    out_i = (inf1 & inf2) | (eq_x & opp & ~either_inf)
    out_x = jnp.where(out_i, 0,
                      jnp.where(inf1, x2, jnp.where(inf2, x1, x3)))
    out_y = jnp.where(out_i, 0,
                      jnp.where(inf1, y2, jnp.where(inf2, y1, y3)))
    return jnp.concatenate([out_x, out_y, out_i.astype(jnp.int32)],
                           axis=-2)

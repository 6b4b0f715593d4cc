"""Device (JAX) elliptic-curve point arithmetic for BN254 G1 and G2.

Points are homogeneous projective (X:Y:Z) with the COMPLETE addition
formulas of Renes–Costello–Batina 2015 (Algorithm 7, a=0): one branch-free
formula covers generic addition, doubling, and the identity (0:1:0).
Branch-free completeness is exactly what TPU wants — the same formula is
vmapped over batches and used as the combiner of `lax.associative_scan`
for Pippenger bucket accumulation (ops/msm.py).

G1 coordinates live in Fq (limb arrays (..., 16)); G2 coordinates in
Fq2 = Fq[u]/(u^2+1) (pairs of limb arrays, shape (..., 2, 16)).

Replaces the CPU curve arithmetic inside go-rapidsnark/snarkjs
(SURVEY.md §2b, "BN254 field & curve arithmetic").  Host oracle: ops/ec.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ec, ff, limbs
from .limbs import FQ, N_LIMBS


class G1Point(NamedTuple):
    """Projective G1 point; coords in Montgomery limb form, shape (..., 16)."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class G2Point(NamedTuple):
    """Projective G2 point; Fq2 coords shape (..., 2, 16), Montgomery form."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


# ---------------------------------------------------------------------------
# field helpers (Fq and Fq2 with a uniform interface)
# ---------------------------------------------------------------------------

def _fq_mul(a, b):
    return limbs.mont_mul(a, b, FQ)


def _fq_add(a, b):
    return limbs.add(a, b, FQ)


def _fq_sub(a, b, b_amp: int = 1):
    return limbs.sub(a, b, FQ, b_amp=b_amp)


def _fq2_mul(a, b):
    """(..., 2, 20) x (..., 2, 20): (a0+a1 u)(b0+b1 u), u^2 = -1.
    Schoolbook (4 Fq muls, one batched call) — Karatsuba would square the
    lazy-limb amplitudes, schoolbook keeps them at the operands'."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    b0, b1 = b[..., 0, :], b[..., 1, :]
    lanes_a = jnp.stack([a0, a1, a0, a1], axis=-2)
    lanes_b = jnp.stack([b0, b1, b1, b0], axis=-2)
    v = limbs.mont_mul(lanes_a, lanes_b, FQ)
    re = _fq_sub(v[..., 0, :], v[..., 1, :])
    im = _fq_add(v[..., 2, :], v[..., 3, :])
    # amplitude-1 out, so Fq2 products compose like Fq ones in _padd
    return limbs.weak_normalize(jnp.stack([re, im], axis=-2), 1)


def _fq2_add(a, b):
    return a + b


def _fq2_sub(a, b, b_amp: int = 1, loose: bool = False):
    d = limbs._sub_const(FQ, b_amp, loose)
    return a + (jnp.asarray(d) - b)


# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

def _mont_q(x: int) -> np.ndarray:
    return limbs.int_to_limbs(x * (1 << limbs.R_BITS) % ff.P_FQ)


@functools.lru_cache(maxsize=None)
def _b3_g1() -> np.ndarray:
    return _mont_q(9)  # 3*b, b=3


@functools.lru_cache(maxsize=None)
def _b3_g2() -> np.ndarray:
    b3 = ec.fq2_scalar(ec.B2, 3)
    return np.stack([_mont_q(b3[0]), _mont_q(b3[1])])


def g1_identity(batch=()) -> G1Point:
    zero = jnp.zeros((*batch, N_LIMBS), dtype=jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(FQ.one_mont), (*batch, N_LIMBS))
    return G1Point(zero, one, zero)


def g2_identity(batch=()) -> G2Point:
    zero = jnp.zeros((*batch, 2, N_LIMBS), dtype=jnp.uint32)
    one = jnp.zeros((*batch, 2, N_LIMBS), dtype=jnp.uint32
                    ).at[..., 0, :].set(jnp.asarray(FQ.one_mont))
    return G2Point(zero, one, zero)


# ---------------------------------------------------------------------------
# complete addition (RCB15 Algorithm 7, a = 0), lane-batched
#
# The formula's 14 field multiplications are grouped into 3 batched calls
# (6 + 2 + 6 independent lanes) so each call is one wide matmul-backed
# Montgomery pipeline rather than 14 separate traced pipelines — smaller
# programs AND better MXU utilization.
# ---------------------------------------------------------------------------

def _padd(p, q, fmul, fadd, fsub, b3, lane_axis):
    """Amplitude discipline (see ops/limbs.py): inputs are amplitude-1
    (the closing weak_normalize guarantees it for chained calls); every
    multiply's operand-amplitude product stays <= 16."""
    x1, y1, z1 = p
    x2, y2, z2 = q

    def stk(*xs):
        return jnp.stack(xs, axis=lane_axis)

    def unstk(a, k):
        return [jnp.take(a, i, axis=lane_axis) for i in range(k)]

    # cross sums (one 6-lane add) — amp 2
    s = fadd(stk(x1, y1, x1, x2, y2, x2), stk(y1, z1, z1, y2, z2, z2))
    sx1y1, sy1z1, sx1z1, sx2y2, sy2z2, sx2z2 = unstk(s, 6)

    # products (one 6-lane mul): amp 1x1 and 2x2 lanes
    m = fmul(stk(x1, y1, z1, sx1y1, sy1z1, sx1z1),
             stk(x2, y2, z2, sx2y2, sy2z2, sx2z2))
    t0, t1, t2, c1, c2, c3 = unstk(m, 6)

    # pair sums (amp 2), then differences (amp 4: 1 + D2's 3)
    ps = fadd(stk(t0, t1, t0), stk(t1, t2, t2))
    d = fsub(stk(c1, c2, c3), ps, b_amp=2)
    t3, t4, y3 = unstk(d, 3)

    t0_3 = fadd(fadd(t0, t0), t0)               # 3 * t0, amp 3

    # b3 products (amp 4x1 worst)
    bb = fmul(stk(t2, y3), jnp.expand_dims(b3, lane_axis))
    t2b, y3b = unstk(bb, 2)

    zs = fadd(t1, t2b)                          # amp 2
    t1n = fsub(t1, t2b)                         # amp 3

    # final products: amp products 4x1, 4x3, 1x3, 3x2, 3x4, 2x4 — all <= 16
    f = fmul(stk(t4, t3, y3b, t1n, t0_3, zs),
             stk(y3b, t1n, t0_3, zs, t3, t4))
    x3a, t2c, y3a, t1z, t0t, z3t = unstk(f, 6)

    x3 = fsub(t2c, x3a)                         # amp 3
    fin = fadd(stk(t1z, z3t), stk(y3a, t0t))    # amp 2
    y3, z3 = unstk(fin, 2)
    # restore amplitude-1 for the next chained addition
    x3 = limbs.weak_normalize(x3, 1)
    fin = limbs.weak_normalize(fin, 1)
    y3, z3 = unstk(fin, 2)
    return x3, y3, z3


def g1_add(p: G1Point, q: G1Point) -> G1Point:
    b3 = jnp.asarray(_b3_g1())
    return G1Point(*_padd(p, q, _fq_mul, _fq_add, _fq_sub, b3, -2))


def g2_add(p: G2Point, q: G2Point) -> G2Point:
    b3 = jnp.asarray(_b3_g2())
    return G2Point(*_padd(p, q, _fq2_mul, _fq2_add, _fq2_sub, b3, -3))


def g1_double(p: G1Point) -> G1Point:
    return g1_add(p, p)


def g2_double(p: G2Point) -> G2Point:
    return g2_add(p, p)


def g1_neg(p: G1Point) -> G1Point:
    # loose tier: the operand may be a complete-addition output (~2^269.6)
    return G1Point(p.x, limbs.neg(p.y, FQ, loose=True), p.z)


def g2_neg(p: G2Point) -> G2Point:
    return G2Point(p.x, limbs.neg(p.y, FQ, loose=True), p.z)


def g1_select(cond, p: G1Point, q: G1Point) -> G1Point:
    """cond (...,) bool: p where true else q."""
    c = cond[..., None]
    return G1Point(jnp.where(c, p.x, q.x), jnp.where(c, p.y, q.y),
                   jnp.where(c, p.z, q.z))


def g2_select(cond, p: G2Point, q: G2Point) -> G2Point:
    c = cond[..., None, None]
    return G2Point(jnp.where(c, p.x, q.x), jnp.where(c, p.y, q.y),
                   jnp.where(c, p.z, q.z))


# ---------------------------------------------------------------------------
# scalar multiplication (batched, fixed 256-bit double-and-add)
# ---------------------------------------------------------------------------

def _scalar_bit(scalar_plain: jnp.ndarray, i) -> jnp.ndarray:
    """Bit i (traced) of plain limb scalars (..., 16) -> (...,) 0/1."""
    limb = jax.lax.dynamic_index_in_dim(
        scalar_plain, i // limbs.LIMB_BITS, axis=-1, keepdims=False)
    return (limb >> (i % limbs.LIMB_BITS).astype(jnp.uint32)) & 1


def g1_scalar_mul(p: G1Point, scalar_plain: jnp.ndarray) -> G1Point:
    """p: batched point; scalar_plain: (..., 16) plain limb form."""
    def body(i, carry):
        acc, base = carry
        bit = _scalar_bit(scalar_plain, i.astype(jnp.uint32))
        added = g1_add(acc, base)
        acc = g1_select(bit == 1, added, acc)
        base = g1_add(base, base)
        return acc, base

    acc0 = g1_identity(p.x.shape[:-1])
    acc, _ = jax.lax.fori_loop(0, 256, body, (acc0, p))
    return acc


def g2_scalar_mul(p: G2Point, scalar_plain: jnp.ndarray) -> G2Point:
    def body(i, carry):
        acc, base = carry
        bit = _scalar_bit(scalar_plain, i.astype(jnp.uint32))
        added = g2_add(acc, base)
        acc = g2_select(bit == 1, added, acc)
        base = g2_add(base, base)
        return acc, base

    acc0 = g2_identity(p.x.shape[:-2])
    acc, _ = jax.lax.fori_loop(0, 256, body, (acc0, p))
    return acc


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------

def g1_from_affine_host(points: list) -> G1Point:
    """List of affine (x, y) tuples or None -> stacked projective device
    arrays in Montgomery form."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    r = 1 << limbs.R_BITS
    q = ff.P_FQ
    to = lambda vals: jnp.asarray(limbs.ints_to_limbs([v * r % q for v in vals]))
    return G1Point(to(xs), to(ys), to(zs))


def g2_from_affine_host(points: list) -> G2Point:
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append((0, 0))
            ys.append((1, 0))
            zs.append((0, 0))
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append((1, 0))
    r = 1 << limbs.R_BITS
    q = ff.P_FQ

    def to(vals):
        flat = []
        for a, b in vals:
            flat.append(a * r % q)
            flat.append(b * r % q)
        return jnp.asarray(limbs.ints_to_limbs(flat)).reshape(-1, 2, N_LIMBS)

    return G2Point(to(xs), to(ys), to(zs))


def g1_to_affine_host(p: G1Point):
    """Single (or batched) device point -> list of affine tuples / None."""
    x = np.asarray(limbs.from_mont(p.x, FQ)).reshape(-1, N_LIMBS)
    y = np.asarray(limbs.from_mont(p.y, FQ)).reshape(-1, N_LIMBS)
    z = np.asarray(limbs.from_mont(p.z, FQ)).reshape(-1, N_LIMBS)
    out = []
    for xi, yi, zi in zip(limbs.limbs_to_ints(x), limbs.limbs_to_ints(y),
                          limbs.limbs_to_ints(z)):
        if zi == 0:
            out.append(None)
        else:
            zinv = ff.inv_mod(zi, ff.P_FQ)
            out.append((xi * zinv % ff.P_FQ, yi * zinv % ff.P_FQ))
    return out


def g2_to_affine_host(p: G2Point):
    x = np.asarray(limbs.from_mont(p.x, FQ)).reshape(-1, 2, N_LIMBS)
    y = np.asarray(limbs.from_mont(p.y, FQ)).reshape(-1, 2, N_LIMBS)
    z = np.asarray(limbs.from_mont(p.z, FQ)).reshape(-1, 2, N_LIMBS)
    out = []
    for xi, yi, zi in zip(x, y, z):
        xt = (limbs.limbs_to_int(xi[0]), limbs.limbs_to_int(xi[1]))
        yt = (limbs.limbs_to_int(yi[0]), limbs.limbs_to_int(yi[1]))
        zt = (limbs.limbs_to_int(zi[0]), limbs.limbs_to_int(zi[1]))
        if zt == (0, 0):
            out.append(None)
        else:
            zinv = ec.fq2_inv(zt)
            out.append((ec.fq2_mul(xt, zinv), ec.fq2_mul(yt, zinv)))
    return out

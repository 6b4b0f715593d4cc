"""Pallas TPU kernel: fused complete EC point addition over BN254.

One kernel fuses the whole RCB complete-addition formula — ~40 Montgomery
multiplies' worth of limb arithmetic — into a single VMEM-resident pass, so
the XLA graph around Pippenger scans shrinks to one primitive per level and
the limb pipeline never round-trips HBM between elementwise steps.

In-kernel layout: operands arrive as (TILE, C*20) blocks (AoS rows) and are
transposed once to (C*20, TILE) so limbs live on sublanes and points on
lanes; all limb arithmetic is VPU schoolbook (no MXU) — at TILE=512 the
vector unit stays saturated and the f32 matmul detour of the XLA path is
unnecessary.

Falls back transparently to the pure-JAX ops/ec_jax.py implementation off
TPU (tests run the fallback; parity is asserted by tests/test_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import ff, limbs
from ..limbs import LIMB_BITS, LIMB_MASK, N_LIMBS, WIDE

TILE = 512


def _const_rows(arr: np.ndarray) -> np.ndarray:
    """(20,) uint32 -> (20, 1) for sublane broadcast."""
    return np.asarray(arr, np.uint32)[:, None]


@functools.lru_cache(maxsize=None)
def _fq_consts():
    fs = limbs.FQ
    return dict(
        p=_const_rows(fs.p_limbs),
        nprime=_const_rows(fs.nprime_limbs),
        d1=_const_rows(fs.sub_d1),
        d2=_const_rows(fs.sub_d2),
        b3_g1=_const_rows(limbs.int_to_limbs(
            9 * fs.r_mod_p % ff.P_FQ)),
    )


def _mont_mul_rows(a, b, p_rows, np_rows):
    """a, b: (k, 20, T) uint32 (amplitude <= 4) -> (k, 20, T)."""
    k, _, t = a.shape
    acc = jnp.zeros((k, WIDE, t), dtype=jnp.uint32)

    def mul_into(acc, x, y):
        for i in range(N_LIMBS):
            prod = x[:, i:i + 1, :] * y          # (k, 20, T)
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            acc = acc.at[:, i:i + N_LIMBS, :].add(lo)
            acc = acc.at[:, i + 1:i + N_LIMBS + 1, :].add(hi)
        return acc

    def weak(x, rounds=2):
        for _ in range(rounds):
            lo = x & LIMB_MASK
            hi = x >> LIMB_BITS
            shifted = jnp.pad(hi[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
            x = lo + shifted
        return x

    tcols = weak(mul_into(acc, a, b))
    m_acc = jnp.zeros((k, WIDE, t), dtype=jnp.uint32)
    m = weak(mul_into(m_acc, tcols[:, :N_LIMBS, :],
                      jnp.broadcast_to(np_rows[None], (k, N_LIMBS, t))))
    m = m[:, :N_LIMBS, :]
    mp_acc = jnp.zeros((k, WIDE, t), dtype=jnp.uint32)
    mp = mul_into(mp_acc, m, jnp.broadcast_to(p_rows[None],
                                              (k, N_LIMBS, t)))
    total = tcols + mp
    # exact normalize (2 local rounds + Kogge-Stone over 41 sublanes)
    total = weak(total, 2)
    g = total >> LIMB_BITS
    d = total & LIMB_MASK
    pp = (d == LIMB_MASK).astype(jnp.uint32)
    shift = 1
    while shift < WIDE:
        gs = jnp.pad(g[:, :WIDE - shift, :], ((0, 0), (shift, 0), (0, 0)))
        ps = jnp.pad(pp[:, :WIDE - shift, :], ((0, 0), (shift, 0), (0, 0)),
                     constant_values=1)
        g = g | (pp & gs)
        pp = pp & ps
        shift *= 2
    carry_in = jnp.pad(g[:, :WIDE - 1, :], ((0, 0), (1, 0), (0, 0)))
    total = (d + carry_in) & LIMB_MASK
    return total[:, N_LIMBS:2 * N_LIMBS, :]


def _g1_padd_rows(x1, y1, z1, x2, y2, z2, c):
    """Coordinates: (20, T) uint32. Returns (x3, y3, z3)."""
    def stk(*xs):
        return jnp.stack(xs, axis=0)

    p_rows, np_rows = c["p"], c["nprime"]
    d1 = c["d1"][None]
    d2 = c["d2"][None]
    b3 = c["b3_g1"]

    s = stk(x1 + y1, y1 + z1, x1 + z1, x2 + y2, y2 + z2, x2 + z2)
    m = _mont_mul_rows(stk(x1, y1, z1, s[0], s[1], s[2]),
                       stk(x2, y2, z2, s[3], s[4], s[5]),
                       p_rows, np_rows)
    t0, t1, t2, c1, c2, c3 = [m[i] for i in range(6)]
    ps = stk(t0 + t1, t1 + t2, t0 + t2)
    dsub = stk(c1, c2, c3) + (d2 - ps)
    t3, t4, y3 = dsub[0], dsub[1], dsub[2]
    t0_3 = t0 + t0 + t0
    bb = _mont_mul_rows(stk(t2, y3),
                        jnp.broadcast_to(b3[None], (2, *b3.shape[:1],
                                                    t2.shape[-1])),
                        p_rows, np_rows)
    t2b, y3b = bb[0], bb[1]
    zs = t1 + t2b
    t1n = t1 + (d1[0] - t2b)
    f = _mont_mul_rows(stk(t4, t3, y3b, t1n, t0_3, zs),
                       stk(y3b, t1n, t0_3, zs, t3, t4),
                       p_rows, np_rows)
    x3a, t2c, y3a, t1z, t0t, z3t = [f[i] for i in range(6)]
    x3 = t2c + (d1[0] - x3a)
    y3 = t1z + y3a
    z3 = z3t + t0t

    def weak1(v):
        lo = v & LIMB_MASK
        hi = v >> LIMB_BITS
        return lo + jnp.pad(hi[:-1, :], ((1, 0), (0, 0)))

    return weak1(x3), weak1(y3), weak1(z3)


def _g1_padd_kernel(a_ref, b_ref, o_ref):
    c = _fq_consts()
    a = a_ref[:].reshape(TILE, 3 * N_LIMBS).T  # (60, TILE)
    b = b_ref[:].reshape(TILE, 3 * N_LIMBS).T
    x1, y1, z1 = a[:N_LIMBS], a[N_LIMBS:2 * N_LIMBS], a[2 * N_LIMBS:]
    x2, y2, z2 = b[:N_LIMBS], b[N_LIMBS:2 * N_LIMBS], b[2 * N_LIMBS:]
    x3, y3, z3 = _g1_padd_rows(x1, y1, z1, x2, y2, z2, c)
    out = jnp.concatenate([x3, y3, z3], axis=0).T  # (TILE, 60)
    o_ref[:] = out.reshape(TILE, 3, N_LIMBS)


def g1_padd_pallas(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a, b: packed G1 points (..., 3, 20) -> (..., 3, 20)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = a.shape
    flat_n = int(np.prod(shape[:-2]))
    pad = (-flat_n) % TILE
    a2 = a.reshape(flat_n, 3, N_LIMBS)
    b2 = b.reshape(flat_n, 3, N_LIMBS)
    if pad:
        zeros = jnp.zeros((pad, 3, N_LIMBS), jnp.uint32)
        a2 = jnp.concatenate([a2, zeros], axis=0)
        b2 = jnp.concatenate([b2, zeros], axis=0)
    n_total = a2.shape[0]
    out = pl.pallas_call(
        _g1_padd_kernel,
        grid=(n_total // TILE,),
        in_specs=[pl.BlockSpec((TILE, 3, N_LIMBS), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, 3, N_LIMBS), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, 3, N_LIMBS), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_total, 3, N_LIMBS), jnp.uint32),
    )(a2, b2)
    if pad:
        out = out[:flat_n]
    return out.reshape(shape)

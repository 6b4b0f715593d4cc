"""Pallas TPU kernels over the limb-major field core (ops/lm.py).

Each kernel body is just the corresponding lm/ec_lm function — arithmetic
lives in ONE place; this module only adds the VMEM tiling.  On non-TPU
backends every wrapper falls back to calling the same function under
plain XLA, so tests and multi-chip dry-runs run anywhere.

Key facts encoded here (learned on v5e):
  * limbs ride sublanes, elements ride lanes: full 128-lane utilization
    (the measured win over the lane-minor XLA core is ~13x per mont_mul);
  * kernels cannot capture array constants, and a lane-1 constant cannot
    be limb-sliced after a broadcast — constants arrive as an input
    pre-materialized at tile width (ec_lm.pack_ec_consts(tile));
  * scalars read at dynamic indices (loop bits) live in SMEM.
"""
from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import ec_lm, lm
from ..lm import N_LIMBS

DEF_TILE = 512
_FORCE_XLA = os.environ.get("ZKF_FORCE_XLA", "0") == "1"


def on_tpu() -> bool:
    return (not _FORCE_XLA) and jax.default_backend() == "tpu"


@contextlib.contextmanager
def _unrolled():
    """Kernel bodies must trace with the UNROLLED schoolbook muls — Mosaic
    cannot lower the rolled fori_loop's dynamic sublane updates.  The flag
    flip is safe because pallas_call traces the body synchronously."""
    prev = lm.UNROLL
    lm.UNROLL = True
    try:
        yield
    finally:
        lm.UNROLL = prev


def _tile(T: int) -> int:
    t = min(T, DEF_TILE)
    while T % t:
        t //= 2
    return max(t, 1)


@functools.lru_cache(maxsize=None)
def _ec_consts_np(tile: int) -> np.ndarray:
    return ec_lm.pack_ec_consts(tile)


def _ec_consts(tile: int):
    # cache ONLY the numpy array: converting inside a trace yields a
    # tracer, and an lru-cached tracer escapes its trace (bench r02 bug)
    return jnp.asarray(_ec_consts_np(tile))


_PADD = {"g1": (ec_lm.padd_g1, ec_lm.G1_ROWS),
         "g2": (ec_lm.padd_g2, ec_lm.G2_ROWS)}


def _b3_of(kind, b31, b32):
    return b31 if kind == "g1" else b32


# ---------------------------------------------------------------------------
# elementwise EC add:  out = p + q
# ---------------------------------------------------------------------------

def _padd_kernel(kind, c_ref, p_ref, q_ref, o_ref):
    fs, b31, b32 = ec_lm.unpack_ec_consts(c_ref[:, :])
    fn, _ = _PADD[kind]
    o_ref[0, :, :] = fn(p_ref[0, :, :], q_ref[0, :, :], fs,
                        _b3_of(kind, b31, b32))


def padd(p: jnp.ndarray, q: jnp.ndarray, kind: str) -> jnp.ndarray:
    """p, q: (..., rows, T) packed point planes -> p + q (elementwise)."""
    fn, rows = _PADD[kind]
    if not on_tpu():
        return fn(p, q)
    shape = jnp.broadcast_shapes(p.shape, q.shape)
    p = jnp.broadcast_to(p, shape).reshape(-1, rows, shape[-1])
    q = jnp.broadcast_to(q, shape).reshape(-1, rows, shape[-1])
    B, _, T = p.shape
    t = _tile(T)
    with _unrolled():
        out = pl.pallas_call(
            functools.partial(_padd_kernel, kind),
            out_shape=jax.ShapeDtypeStruct((B, rows, T), jnp.int32),
            grid=(B, T // t),
            in_specs=[pl.BlockSpec((ec_lm.EC_CONST_ROWS * N_LIMBS, t), lambda b, j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, rows, t), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, rows, t), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rows, t), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM),
        )(_ec_consts(t), p, q)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# fold-half EC add:  out[.., j] = x[.., j] + x[.., j + m/2]
# (one upsweep level of the MSM sum tree; zero-copy via two BlockSpecs
# indexing the same input)
# ---------------------------------------------------------------------------

def fold_padd(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """x: (B, rows, m) -> (B, rows, m // 2), m even."""
    fn, rows = _PADD[kind]
    B, _, m = x.shape
    h = m // 2
    # Mosaic requires lane-dim blocks divisible by 128 or equal to the full
    # array dim; the fold's half-width block (h) against a 2h array can
    # satisfy neither once h < 128 — the tail of every sum tree.  The work
    # there is tiny, so hand it to plain XLA.
    if h < 128 or not on_tpu():
        return fn(x[..., :h], x[..., h:])
    t = _tile(h)
    nj = h // t
    with _unrolled():
        out = pl.pallas_call(
            functools.partial(_padd_kernel, kind),
            out_shape=jax.ShapeDtypeStruct((B, rows, h), jnp.int32),
            grid=(B, nj),
            in_specs=[pl.BlockSpec((ec_lm.EC_CONST_ROWS * N_LIMBS, t), lambda b, j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, rows, t), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, rows, t),
                                   lambda b, j, _nj=nj: (b, 0, j + _nj),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rows, t), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM),
        )(_ec_consts(t), x, x)
    return out


# ---------------------------------------------------------------------------
# fold-half MIXED EC add: affine pairs -> projective (MSM upsweep level 0)
# ---------------------------------------------------------------------------

def _padd_aa_kernel(kind, c_ref, p_ref, q_ref, o_ref):
    fs, b31, b32 = ec_lm.unpack_ec_consts(c_ref[:, :])
    o_ref[0, :, :] = ec_lm.padd_aa(p_ref[0, :, :], q_ref[0, :, :], kind,
                                   fs, b31, b32)


def fold_padd_aa(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """x: (B, arows, m) AFFINE planes -> (B, rows, m // 2) PROJECTIVE:
    out[.., j] = x[.., j] (+) x[.., j + m/2].  Level 0 of the MSM sum
    tree: 10 products instead of 12 and 43-row (85 for g2) input reads
    instead of 63 (126)."""
    from .. import ec_affine

    _, rows = _PADD[kind]
    arows = ec_affine.AROWS[kind]
    B, ar, m = x.shape
    assert ar == arows
    h = m // 2
    if h < 128 or not on_tpu():
        return ec_lm.padd_aa(x[..., :h], x[..., h:], kind)
    t = _tile(h)
    nj = h // t
    with _unrolled():
        out = pl.pallas_call(
            functools.partial(_padd_aa_kernel, kind),
            out_shape=jax.ShapeDtypeStruct((B, rows, h), jnp.int32),
            grid=(B, nj),
            in_specs=[pl.BlockSpec((ec_lm.EC_CONST_ROWS * N_LIMBS, t),
                                   lambda b, j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, arows, t), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, arows, t),
                                   lambda b, j, _nj=nj: (b, 0, j + _nj),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rows, t), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM),
        )(_ec_consts(t), x, x)
    return out


# ---------------------------------------------------------------------------
# elementwise Montgomery ops
# ---------------------------------------------------------------------------

def _mont_mul_kernel(c_ref, a_ref, b_ref, o_ref):
    fs = lm.unpack_consts(c_ref[:, :])
    o_ref[:, :, :] = lm.mont_mul(a_ref[:, :, :], b_ref[:, :, :], fs)


@functools.lru_cache(maxsize=None)
def _field_consts_np(field: str, tile: int) -> np.ndarray:
    fs = lm.FQ if field == "fq" else lm.FR
    return lm.pack_consts(fs, tile)


MM_BLK = 8          # leading-axis rows per kernel step (amortizes grid
                    # overhead; the element axis is usually thousands)


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, fs=lm.FQ) -> jnp.ndarray:
    """(..., 21, T) x (..., 21, T) -> (..., 21, T) Montgomery product in a
    Pallas kernel (FQ or FR).  The XLA fallback path (other backends /
    other fields) uses the rolled schoolbook, which on TPU is ~30x slower
    per element than this kernel (HBM-bound accumulator loop) — route
    every hot FR multiply (NTT butterflies, sparse matvec) through here."""
    if fs is lm.FQ:
        field = "fq"
    elif fs is lm.FR:
        field = "fr"
    else:
        field = None
    if not on_tpu() or field is None:
        return lm.mont_mul(a, b, fs)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, N_LIMBS, shape[-1])
    b = jnp.broadcast_to(b, shape).reshape(-1, N_LIMBS, shape[-1])
    B, _, T = a.shape
    t = _tile(T)
    blk = MM_BLK
    Bp = (B + blk - 1) // blk * blk
    if Bp != B:
        pad = [(0, Bp - B), (0, 0), (0, 0)]
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    with _unrolled():
        out = pl.pallas_call(
            _mont_mul_kernel,
            out_shape=jax.ShapeDtypeStruct((Bp, N_LIMBS, t * (T // t)),
                                           jnp.int32),
            grid=(Bp // blk, T // t),
            in_specs=[pl.BlockSpec((lm.N_CONST_ROWS * N_LIMBS, t),
                                   lambda bb, j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((blk, N_LIMBS, t),
                                   lambda bb, j: (bb, 0, j),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((blk, N_LIMBS, t),
                                   lambda bb, j: (bb, 0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, N_LIMBS, t),
                                   lambda bb, j: (bb, 0, j),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(_field_consts_np(field, t)), a, b)
    return out[:B].reshape(shape)


def _fold_mul_kernel(c_ref, a_ref, b_ref, o_ref):
    fs, _, _ = ec_lm.unpack_ec_consts(c_ref[:, :])
    o_ref[0, :, :] = lm.mont_mul(a_ref[0, :, :], b_ref[0, :, :], fs)


def fold_mul(x: jnp.ndarray, fs=lm.FQ) -> jnp.ndarray:
    """x: (B, 21, m) -> (B, 21, m//2): elementwise product of halves."""
    B, _, m = x.shape
    h = m // 2
    if h < 128 or not on_tpu() or fs is not lm.FQ:  # see fold_padd
        return lm.mont_mul(x[..., :h], x[..., h:], fs)
    t = _tile(h)
    nj = h // t
    with _unrolled():
        out = pl.pallas_call(
            _fold_mul_kernel,
            out_shape=jax.ShapeDtypeStruct((B, N_LIMBS, h), jnp.int32),
            grid=(B, nj),
            in_specs=[pl.BlockSpec((ec_lm.EC_CONST_ROWS * N_LIMBS, t), lambda b, j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, N_LIMBS, t), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, N_LIMBS, t),
                                   lambda b, j, _nj=nj: (b, 0, j + _nj),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, N_LIMBS, t), lambda b, j: (b, 0, j),
                                   memory_space=pltpu.VMEM),
        )(_ec_consts(t), x, x)
    return out


# ---------------------------------------------------------------------------
# Fermat inversion (pow chain in one kernel; bits prefetched to SMEM)
# ---------------------------------------------------------------------------

def _inv_kernel(nbits, c_ref, bits_ref, a_ref, o_ref):
    fs, _, _ = ec_lm.unpack_ec_consts(c_ref[:, :])
    one = fs.one_mont
    a = a_ref[:, :]

    def body(i, carry):
        acc, base = carry
        mult = lm.mont_mul(acc, base, fs)
        acc = jnp.where(bits_ref[0, i] == 1, mult, acc)
        return acc, lm.mont_mul(base, base, fs)

    # consts are materialized at lane width == T, so `one` is already
    # (21, T) — never slice-then-broadcast (Mosaic can't lower it)
    acc, _ = jax.lax.fori_loop(0, nbits, body, (one.astype(jnp.int32), a))
    o_ref[:, :] = acc


def inv(a: jnp.ndarray, fs=lm.FQ) -> jnp.ndarray:
    """(21, T) Montgomery inverse via Fermat (inv(0) = 0)."""
    if not on_tpu() or fs is not lm.FQ:
        return lm.inv(a, fs)
    T = a.shape[-1]
    bits = np.asarray(lm.FQ.p_minus_2_bits, np.int32)[None, :]
    with _unrolled():
        out = pl.pallas_call(
            functools.partial(_inv_kernel, bits.shape[-1]),
            out_shape=jax.ShapeDtypeStruct((N_LIMBS, T), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(_ec_consts(max(T, 1)), jnp.asarray(bits), a)
    return out


def batch_inv(d: jnp.ndarray, fs=lm.FQ) -> jnp.ndarray:
    """Montgomery-batch inversion over the last axis of (B, 21, X),
    X a power of two.  Zero lanes must already be mapped to one.
    ~3 muls per lane + one Fermat chain over (21, B)."""
    B, _, X = d.shape
    levels = [d]
    x = d
    while x.shape[-1] > 1:
        x = fold_mul(x, fs)
        levels.append(x)
    root = x.reshape(B, N_LIMBS, 1)[:, :, 0].T            # (21, B)
    root_inv = inv(root, fs).T[:, :, None]                # (B, 21, 1)
    invs = root_inv
    for lvl in range(len(levels) - 2, -1, -1):
        cur = levels[lvl]
        h = cur.shape[-1] // 2
        left = mont_mul(invs, cur[..., h:], fs)
        right = mont_mul(invs, cur[..., :h], fs)
        invs = jnp.concatenate([left, right], axis=-1)
    return invs


# ---------------------------------------------------------------------------
# identity planes for padding
# ---------------------------------------------------------------------------

def identity_plane(kind: str, batch, T) -> np.ndarray:
    if kind == "g1":
        return ec_lm.g1_identity_plane(batch, T)
    return ec_lm.g2_identity_plane(batch, T)

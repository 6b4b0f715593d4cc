"""Kernel-geometry experiments (real chip): find the fast block/grid
layout for single-pass mont_mul and padd kernels.

The chain microbench (micro_montmul.py) amortizes HBM over 20 in-VMEM
muls and hits 439 Mmul/s; production single-pass kernels measure 25 ns
(K.mont_mul at (128,21,8192)) and 74 ns/lane-padd (fold_padd).  HBM
traffic alone only explains ~0.5 ns.  This sweeps geometries to locate
the overhead.
"""
import functools
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zkfranchise_tpu.ops import ec_lm, lm
from zkfranchise_tpu.ops.pallas import lm_kernels as K
from zkfranchise_tpu.utils.metrics import force

NL = lm.N_LIMBS


def timeit(name, work, fn, *args, reps=3):
    try:
        out = fn(*args)
        force(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
            force(out)
        dt = (time.time() - t0) / reps
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:120]}", flush=True)
        return None
    print(f"{name:44s} {dt*1e3:9.2f} ms   {dt/work*1e9:7.2f} ns/unit",
          flush=True)
    return dt


def _mm_kernel(c_ref, a_ref, b_ref, o_ref):
    fs = lm.unpack_consts(c_ref[:, :])
    o_ref[...] = lm.mont_mul(a_ref[...], b_ref[...], fs)


@functools.partial(jax.jit, static_argnums=(2, 3))
def mm2d(a, b, tile, chain):
    T = a.shape[-1]

    def kern(c_ref, a_ref, b_ref, o_ref):
        fs = lm.unpack_consts(c_ref[:, :])
        x = a_ref[:, :]
        for _ in range(chain):
            x = lm.mont_mul(x, b_ref[:, :], fs)
        o_ref[:, :] = x

    with K._unrolled():
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NL, T), jnp.int32),
            grid=(T // tile,),
            in_specs=[pl.BlockSpec((lm.N_CONST_ROWS * NL, tile),
                                   lambda i: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((NL, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((NL, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((NL, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(lm.pack_consts(lm.FQ, tile)), a, b)


@functools.partial(jax.jit, static_argnums=(2, 3))
def mm3d(a, b, tile, blk):
    B, _, T = a.shape

    with K._unrolled():
        return pl.pallas_call(
            _mm_kernel,
            out_shape=jax.ShapeDtypeStruct((B, NL, T), jnp.int32),
            grid=(B // blk, T // tile),
            in_specs=[pl.BlockSpec((lm.N_CONST_ROWS * NL, tile),
                                   lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((blk, NL, tile), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((blk, NL, tile), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, NL, tile), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(lm.pack_consts(lm.FQ, tile)), a, b)


def _padd2d_kernel(kind, c_ref, p_ref, q_ref, o_ref):
    fs, b31, b32 = ec_lm.unpack_ec_consts(c_ref[:, :])
    fn = ec_lm.padd_g1 if kind == "g1" else ec_lm.padd_g2
    o_ref[:, :] = fn(p_ref[:, :], q_ref[:, :], fs,
                     b31 if kind == "g1" else b32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def fold2d(x, tile, kind):
    """x: (rows, L) with L = B*m flattened; fold pairs (seg j, seg j+h)
    within each B-segment of m lanes."""
    rows, L = x.shape
    m = int(os.environ.get("EXPT_M", "8192"))
    B = L // m
    h = m // 2
    nj = h // tile

    with K._unrolled():
        return pl.pallas_call(
            functools.partial(_padd2d_kernel, kind),
            out_shape=jax.ShapeDtypeStruct((rows, B * h), jnp.int32),
            grid=(B, nj),
            in_specs=[pl.BlockSpec((ec_lm.EC_CONST_ROWS * NL, tile),
                                   lambda b, j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((rows, tile),
                                   lambda b, j, _nj=nj: (0, b * 2 * _nj + j),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((rows, tile),
                                   lambda b, j, _nj=nj: (0, b * 2 * _nj + _nj + j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, tile),
                                   lambda b, j, _nj=nj: (0, b * _nj + j),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(K._ec_consts_np(tile)), x, x)


def main():
    print(f"# backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    T = 1 << 20
    a2 = jnp.asarray(rng.integers(0, 1 << 13, (NL, T), dtype=np.int32))
    b2 = jnp.asarray(rng.integers(0, 1 << 13, (NL, T), dtype=np.int32))
    a3 = a2.reshape(128, NL, T // 128)
    b3 = b2.reshape(128, NL, T // 128)

    timeit("mm 2D t=512 single", T, mm2d, a2, b2, 512, 1)
    timeit("mm 2D t=2048 single", T, mm2d, a2, b2, 2048, 1)
    timeit("mm 2D t=8192 single", T, mm2d, a2, b2, 8192, 1)
    timeit("mm 2D t=32768 single", T, mm2d, a2, b2, 32768, 1)
    timeit("mm 2D t=512 chain2 (per-mul)", 2 * T, mm2d, a2, b2, 512, 2)
    timeit("mm 2D t=512 chain8 (per-mul)", 8 * T, mm2d, a2, b2, 512, 8)
    timeit("mm 2D t=2048 chain8 (per-mul)", 8 * T, mm2d, a2, b2, 2048, 8)
    timeit("mm 3D blk=8 t=512 (K.mont_mul geom)", T, mm3d, a3, b3, 512, 8)
    timeit("mm 3D blk=1 t=512", T, mm3d, a3, b3, 512, 1)
    timeit("mm 3D blk=1 t=8192", T, mm3d, a3, b3, 8192, 1)
    timeit("K.mont_mul (128,21,8192)", T, jax.jit(
        lambda u, v: K.mont_mul(u, v, lm.FQ)), a3, b3)

    # padd folds: equivalent of (B=128, 63, m=8192) -> half
    m = 8192
    B = 128
    os.environ["EXPT_M"] = str(m)
    rows = ec_lm.G1_ROWS
    x3 = jnp.asarray(rng.integers(0, 1 << 13, (B, rows, m), dtype=np.int32))
    x2 = jnp.asarray(rng.integers(0, 1 << 13, (rows, B * m), dtype=np.int32))
    n_padd = B * m // 2
    timeit("fold_padd current (1,63,t) blocks", n_padd,
           jax.jit(lambda v: K.fold_padd(v, "g1")), x3)
    timeit("fold2d g1 t=512", n_padd, fold2d, x2, 512, "g1")
    timeit("fold2d g1 t=2048", n_padd, fold2d, x2, 2048, "g1")
    timeit("fold2d g1 t=4096", n_padd, fold2d, x2, 4096, "g1")


if __name__ == "__main__":
    main()

"""Microbenchmark: mont_mul throughput for the limb-major 21x13 core
(ops/lm.py) under plain XLA and inside a Pallas kernel.  Run on the real
TPU chip."""
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

from zkfranchise_tpu.ops import ff, lm

P = ff.P_FQ
NL = lm.N_LIMBS


def chain_kernel(n_iters, c_ref, a_ref, b_ref, o_ref):
    fs = lm.unpack_consts(c_ref[:, :])  # (105, tile) wide constants
    x = a_ref[:, :]
    b = b_ref[:, :]
    for _ in range(n_iters):
        x = lm.mont_mul(x, b, fs)
    o_ref[:, :] = x


@functools.partial(jax.jit, static_argnums=(2, 3))
def pallas_chain(a, b, iters, tile):
    T = a.shape[-1]
    return pl.pallas_call(
        functools.partial(chain_kernel, iters),
        out_shape=jax.ShapeDtypeStruct((NL, T), jnp.int32),
        grid=(T // tile,),
        in_specs=[pl.BlockSpec((lm.N_CONST_ROWS * NL, tile), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NL, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NL, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NL, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(jnp.asarray(lm.pack_consts(lm.FQ, tile)), a, b)


@functools.partial(jax.jit, static_argnums=(2,))
def xla_lm_chain(a, b, iters):
    x = a
    for _ in range(iters):
        x = lm.mont_mul(x, b, lm.FQ)
    return x


def bench(tag, fn, *args, reps=10, work=1):
    r = fn(*args)
    force(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    force(r)
    dt = (time.time() - t0) / reps
    print(f"{tag:24s} {work/dt/1e6:9.1f} Mmul/s  ({dt*1e3:8.2f} ms)")
    return r


from zkfranchise_tpu.utils.metrics import force


def main():
    rng = np.random.default_rng(0)
    T = 128 * 1024
    ITERS = 20
    xs = [int.from_bytes(rng.bytes(31), "big") % P for _ in range(256)]
    ys = [int.from_bytes(rng.bytes(31), "big") % P for _ in range(256)]

    a_lm = np.tile(lm.ints_to_lm(xs), (1, T // 256))
    b_lm = np.tile(lm.ints_to_lm(ys), (1, T // 256))
    aj, bj = jnp.asarray(a_lm), jnp.asarray(b_lm)

    # correctness of pallas path on device
    out = np.asarray(pallas_chain(aj[:, :256], bj[:, :256], 1, 256))
    rinv = pow(1 << lm.R_BITS, -1, P)
    ok = all(g % P == x * y * rinv % P
             for g, x, y in zip(lm.lm_to_ints(out), xs, ys))
    print("pallas lm correct on device:", ok)

    work = T * ITERS
    for tile in (512, 1024, 2048, 4096):
        bench(f"pallas lm tile={tile}", pallas_chain, aj, bj, ITERS, tile,
              work=work)
    bench("xla lm", xla_lm_chain, aj, bj, ITERS, work=work)


if __name__ == "__main__":
    main()

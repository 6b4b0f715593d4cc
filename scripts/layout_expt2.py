"""Boundary-cost experiments: is the ~0.107 ns/BYTE per pallas-call
element visit XLA<->pallas boundary copies, or true memory speed?

E1 pallas identity (o = a + 1)      — pure boundary, no compute
E2 XLA add (jnp, no pallas)         — what XLA's own boundary costs
E3 pallas identity, 24-row shape    — sublane-aligned (8 | 24)
E4 two chained pallas identities    — pallas->pallas marginal cost
E5 grid-over-levels aliased kernel  — upsweep-shaped I/O in ONE call
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

from zkfranchise_tpu.utils.metrics import force


def timeit(name, nbytes, fn, *args, reps=5):
    try:
        out = fn(*args)
        force(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
            force(out)
        dt = (time.time() - t0) / reps
    except Exception as e:
        print(f"{name:40s} FAILED: {str(e)[:100]}", flush=True)
        return
    print(f"{name:40s} {dt*1e3:9.2f} ms   {nbytes/dt/1e9:8.1f} GB/s",
          flush=True)


def _id_kernel(a_ref, o_ref):
    o_ref[...] = a_ref[...] + 1


@functools.partial(jax.jit, static_argnums=(1,))
def pallas_id(a, tile):
    R, T = a.shape
    return pl.pallas_call(
        _id_kernel,
        out_shape=jax.ShapeDtypeStruct((R, T), jnp.int32),
        grid=(T // tile,),
        in_specs=[pl.BlockSpec((R, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(a)


@functools.partial(jax.jit, static_argnums=(1,))
def pallas_id2(a, tile):
    return pallas_id(pallas_id(a, tile), tile)


@jax.jit
def xla_add(a):
    return a + 1


@jax.jit
def xla_chain4(a):
    for _ in range(4):
        a = a + 1
    return a


def _fold_kernel(a_ref, o_ref):
    h = a_ref.shape[-1] // 2
    o_ref[...] = a_ref[..., :h] + a_ref[..., h:]


@functools.partial(jax.jit, static_argnums=(1,))
def fused_upsweep(x, tile):
    """(R, m) -> all fold levels in ONE aliased pallas call: the output
    buffer holds [level1 | level2 | ...] (total m elements); grid steps
    walk levels; each step reads the PREVIOUS level from the aliased
    output buffer (level 0 = the input)."""
    R, m = x.shape
    log_m = m.bit_length() - 1

    # grid step k handles level k+1 (width m >> (k+1)) as ONE block
    offs = [0]
    for l in range(1, log_m + 1):
        offs.append(offs[-1] + (m >> l))

    def kernel(a_ref, o_ref, *, level_sizes):
        pass  # unused; see per-level calls below

    # simpler: one pallas call per level is what we have today; the
    # single-call version needs input_output_aliases on a scratch level
    # buffer.  Use a manual fori-free unrolled chain INSIDE one kernel
    # with the whole array in VMEM (m small enough here).
    def mono_kernel(a_ref, o_ref):
        x = a_ref[...]
        outs = []
        while x.shape[-1] > 1:
            h = x.shape[-1] // 2
            x = x[..., :h] + x[..., h:]
            outs.append(x)
        o_ref[...] = jnp.concatenate(outs, axis=-1)

    return pl.pallas_call(
        mono_kernel,
        out_shape=jax.ShapeDtypeStruct((R, m - 1), jnp.int32),
    )(x)


def main():
    print(f"# backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    T = 1 << 20
    a21 = jnp.asarray(rng.integers(0, 1 << 13, (21, T), dtype=np.int32))
    a24 = jnp.asarray(rng.integers(0, 1 << 13, (24, T), dtype=np.int32))
    a8 = jnp.asarray(rng.integers(0, 1 << 13, (8, T), dtype=np.int32))
    nb21 = 2 * 21 * T * 4          # read + write
    nb24 = 2 * 24 * T * 4
    nb8 = 2 * 8 * T * 4

    timeit("E2 XLA add (21,1M)", nb21, xla_add, a21)
    timeit("E2b XLA chain4 (21,1M)", 2 * nb21, xla_chain4, a21)
    timeit("E1 pallas id (21,1M) t=512", nb21, pallas_id, a21, 512)
    timeit("E1b pallas id (21,1M) t=8192", nb21, pallas_id, a21, 8192)
    timeit("E3 pallas id (24,1M) t=512", nb24, pallas_id, a24, 512)
    timeit("E3b pallas id (8,1M) t=512", nb8, pallas_id, a8, 512)
    timeit("E4 pallas id x2 (21,1M) t=512", 2 * nb21, pallas_id2, a21, 512)

    # upsweep-shaped: (63, 64k) fits VMEM? 63*65536*4 = 16.5MB + out: ok
    x = jnp.asarray(rng.integers(0, 1 << 13, (63, 1 << 16), dtype=np.int32))
    nbx = 63 * (1 << 16) * 4 * 2
    timeit("E5 mono-kernel upsweep (63,64k)", nbx, fused_upsweep, x, 512)


if __name__ == "__main__":
    main()

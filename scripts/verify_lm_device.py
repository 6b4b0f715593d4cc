"""Drive the limb-major field/EC core end-to-end on the real TPU.

Computes k*G1 and k*G2 for random 254-bit scalars entirely on-device —
double-and-add whose inner op is ec_lm.padd inside a Pallas kernel —
and checks the affine results against the host bigint oracle (ops/ec.py).
Exercises: pallas_call, mont_mul, weak-norm carry trick, spread-D subs,
complete-addition identity/double paths (the scalar's 0-bits select the
un-added accumulator; bit runs exercise doubling).
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

from zkfranchise_tpu.ops import ec, ec_lm, ff, lm
from zkfranchise_tpu.ops.pallas.lm_kernels import _unrolled

print("devices:", jax.devices(), file=sys.stderr)


def scalar_mul_kernel(nbits, rows, padd, c_ref, bits_ref, p_ref, acc_ref):
    fs, b31, b32 = ec_lm.unpack_ec_consts(c_ref[:, :])
    b3 = b31 if rows == ec_lm.G1_ROWS else b32
    base = p_ref[:, :]
    T = base.shape[-1]
    NL = lm.N_LIMBS
    one = jnp.broadcast_to(fs.one_mont, (NL, T)).astype(jnp.int32)
    z = jnp.zeros((NL, T), jnp.int32)
    if rows == ec_lm.G1_ROWS:
        acc = jnp.concatenate([z, one, z], axis=0)
    else:
        acc = jnp.concatenate([z, z, one, z, z, z], axis=0)

    def body(i, carry):
        acc, base = carry
        bit = bits_ref[0, i]
        added = padd(acc, base, fs, b3)
        acc = jnp.where(bit == 1, added, acc)
        base = padd(base, base, fs, b3)
        return acc, base

    acc, base = jax.lax.fori_loop(0, nbits, body, (acc, base))
    acc_ref[:, :] = acc


@functools.partial(jax.jit, static_argnums=(3, 4))
def device_scalar_mul(consts, bits, pts, rows, kind):
    padd = ec_lm.padd_g1 if kind == "g1" else ec_lm.padd_g2
    T = pts.shape[-1]
    # kernel bodies must trace with the UNROLLED schoolbook muls — Mosaic
    # cannot lower the rolled fori_loop's dynamic sublane updates
    with _unrolled():
        return pl.pallas_call(
            functools.partial(scalar_mul_kernel, bits.shape[-1], rows, padd),
            out_shape=jax.ShapeDtypeStruct((rows, T), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(consts, bits, pts)


def run(kind):
    rng = np.random.default_rng(11)
    T = 128
    ks = [int.from_bytes(rng.bytes(32), "big") % ff.P_FR for _ in range(T)]
    if kind == "g1":
        base_host = [ec.g1_mul(7 + j) for j in range(T)]
        table = ec_lm.g1_table(base_host).T
        rows = ec_lm.G1_ROWS
    else:
        base_host = [ec.g2_mul(7 + j) for j in range(T)]
        table = ec_lm.g2_table(base_host).T
        rows = ec_lm.G2_ROWS
    nbits = 254
    bits = np.zeros((1, nbits), np.int32)
    # one shared scalar per run keeps the kernel simple; per-lane bases
    k = ks[0]
    for i in range(nbits):
        bits[0, i] = (k >> i) & 1

    consts = jnp.asarray(ec_lm.pack_ec_consts(T))
    t0 = time.time()
    out = device_scalar_mul(consts, jnp.asarray(bits),
                            jnp.asarray(table), rows, kind)
    jax.block_until_ready(out)
    print(f"# {kind} kernel ran in {time.time()-t0:.1f}s (incl. compile)",
          file=sys.stderr)
    if kind == "g1":
        got = ec_lm.g1_plane_to_affine(out)
        want = [ec.G1.mul(k, p) for p in base_host]
    else:
        got = ec_lm.g2_plane_to_affine(out)
        want = [ec.G2.mul(k, p) for p in base_host]
    ok = got == want
    print(f"{kind}: 128-lane scalar-mul (254-bit) matches host oracle:", ok)
    return ok


def main():
    ok1 = run("g1")
    ok2 = run("g2")
    print("VERDICT:", "PASS" if (ok1 and ok2) else "FAIL")


if __name__ == "__main__":
    main()

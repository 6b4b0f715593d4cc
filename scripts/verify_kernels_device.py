"""On-hardware parity probe for the production Pallas kernels.

Runs the EXACT kernels the prover uses — K.padd (g1/g2), K.fold_padd,
K.mont_mul, K.batch_inv, and the full production MSM (ops/msm_lm.msm,
g1 AND g2) — on the real TPU and checks every result against the host
bigint oracle (ops/ec.py, ops/ff.py).  Run with no args on a TPU host:

    python scripts/verify_kernels_device.py

Exit code 0 iff everything matches.  This is the committed equivalent of
the round-3 judge's probe; scripts/verify_lm_device.py covers the
hand-rolled in-kernel scalar-mul chain, this file covers the production
kernel wrappers + MSM composition.
"""
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

from zkfranchise_tpu.ops import ec, ec_affine, ec_lm, ff, lm, msm_lm
from zkfranchise_tpu.ops.pallas import lm_kernels as K

FAILED = []


def check(name, ok):
    print(f"{'PASS' if ok else 'FAIL'}  {name}")
    if not ok:
        FAILED.append(name)


def timed(name, fn):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    print(f"# {name}: {time.time()-t0:.1f}s (incl. compile)", file=sys.stderr)
    return out


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(17)
    T = 256

    # --- padd g1/g2 elementwise over T lanes -------------------------------
    for kind, grp, gmul, to_aff in (
            ("g1", ec.G1, ec.g1_mul, ec_lm.g1_plane_to_affine),
            ("g2", ec.G2, ec.g2_mul, ec_lm.g2_plane_to_affine)):
        tab = ec_lm.g1_table if kind == "g1" else ec_lm.g2_table
        ps = [gmul(3 + j) for j in range(T)]
        qs = [gmul(1000 + 7 * j) for j in range(T)]
        pp = jnp.asarray(tab(ps).T)
        qq = jnp.asarray(tab(qs).T)
        out = timed(f"padd {kind}",
                    lambda: jax.jit(lambda a, b: K.padd(a, b, kind))(pp, qq))
        want = [grp.add(p, q) for p, q in zip(ps, qs)]
        check(f"padd {kind} ({T} lanes)", to_aff(out) == want)

        # doubling + identity through the same kernel
        out2 = jax.jit(lambda a, b: K.padd(a, b, kind))(pp, pp)
        check(f"pdouble {kind}", to_aff(out2) == [grp.double(p) for p in ps])
        ident = jnp.asarray(K.identity_plane(kind, (), T))
        out3 = jax.jit(lambda a, b: K.padd(a, b, kind))(ident, qq)
        check(f"padd identity {kind}", to_aff(out3) == qs)

        # fold_padd: (1, rows, 2T) -> (1, rows, T)
        both = jnp.concatenate([pp, qq], axis=-1)[None]
        outf = timed(f"fold_padd {kind}",
                     lambda: jax.jit(lambda x: K.fold_padd(x, kind))(both))
        check(f"fold_padd {kind}", to_aff(outf[0]) == want)

    # --- mont_mul kernel ----------------------------------------------------
    xs = [int.from_bytes(rng.bytes(31), "big") % ff.P_FQ for _ in range(T)]
    ys = [int.from_bytes(rng.bytes(31), "big") % ff.P_FQ for _ in range(T)]
    a = jnp.asarray(lm.ints_to_lm(xs))
    b = jnp.asarray(lm.ints_to_lm(ys))
    out = jax.jit(K.mont_mul)(a, b)
    rinv = pow(1 << lm.R_BITS, -1, ff.P_FQ)
    got = lm.lm_to_ints(np.asarray(out))
    check("mont_mul kernel", all(
        g % ff.P_FQ == x * y * rinv % ff.P_FQ
        for g, x, y in zip(got, xs, ys)))

    # --- batch_inv ----------------------------------------------------------
    vals = [int.from_bytes(rng.bytes(31), "big") % ff.P_FQ or 1
            for _ in range(128)]
    rm = 1 << lm.R_BITS
    d = jnp.asarray(np.stack([lm.ints_to_lm(
        [v * rm % ff.P_FQ for v in vals])]))           # (1, 21, 128) mont
    iv = timed("batch_inv", lambda: jax.jit(K.batch_inv)(d))
    got = lm.lm_to_ints(np.asarray(lm.from_mont(iv, lm.FQ)))
    check("batch_inv kernel", got == [pow(v, -1, ff.P_FQ) for v in vals])

    # --- full production MSM, g1 and g2 ------------------------------------
    for kind, grp, gmul, to_aff, n in (
            ("g1", ec.G1, ec.g1_mul, ec_lm.g1_plane_to_affine, 300),
            ("g2", ec.G2, ec.g2_mul, ec_lm.g2_plane_to_affine, 48)):
        B = 8
        tab_fn = lambda ps: ec_affine.affine_table(ps, kind)
        pts = [gmul(j + 3) for j in range(n)]
        scal = [[int.from_bytes(rng.bytes(32), "big") % ff.P_FR
                 for _ in range(n)] for _ in range(B)]
        sc = jnp.asarray(np.stack(
            [lm.ints_to_lm([scal[j][i] for j in range(B)])
             for i in range(n)]))
        table = jnp.asarray(tab_fn(pts))
        out = timed(f"msm {kind} n={n} B={B}",
                    lambda: jax.jit(msm_lm.msm, static_argnums=(2,))(
                        sc, table, kind))
        plane = jnp.swapaxes(out[..., 0], 0, 1)
        want = [ec.msm_host(row, pts, grp) for row in scal]
        check(f"msm {kind} n={n} B={B} vs host oracle", to_aff(plane) == want)

    print("VERDICT:", "PASS" if not FAILED else f"FAIL {FAILED}")
    sys.exit(0 if not FAILED else 1)


if __name__ == "__main__":
    main()

"""Per-stage timing of the device prover on the real chip.

Times each jitted stage (witness / quotient / MSMs / assemble) separately
after warm-up, to direct optimization effort.  Not part of the test suite.
"""
import json
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
sys.path.insert(0, str(ROOT))

N_LEVELS = int(os.environ.get("BENCH_NLEVELS", "16"))
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from zkfranchise_tpu.groth16.device import DeviceProver
    from zkfranchise_tpu.models.census import CensusCircuit
    from zkfranchise_tpu.ops import limbs

    sys.path.insert(0, str(ROOT))
    import bench as benchmod

    circuit = CensusCircuit(N_LEVELS)
    pk, vk = benchmod.get_or_make_setup(circuit)
    arrs = benchmod.get_or_make_inputs()
    arrs = {k: np.asarray(v)[:BATCH] if np.asarray(v).ndim else v
            for k, v in arrs.items()}
    prover = DeviceProver(circuit, pk)
    print(f"# nvars={pk.n_vars} npub={pk.n_public} domain={pk.domain}",
          file=sys.stderr)
    print(f"# a_pts={prover.a_pts.shape} c_pts={prover.c_pts.shape}",
          file=sys.stderr)

    r_arr, s_arr = benchmod.prover_rs(prover, seed=3)

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / ITERS
        print(f"{name:24s} {dt*1e3:10.1f} ms")
        return out

    w, w_plain = timeit("witness", prover._witness_jit, arrs)
    q_plain = timeit("quotient(spmv+ntt)", prover._quotient_jit, w)

    npub = prover.pk_meta[1]
    r1 = r_arr[..., None, :]
    s1 = s_arr[..., None, :]
    wa = jnp.concatenate([w_plain, r1], axis=-2)
    ws = jnp.concatenate([w_plain, s1], axis=-2)
    pa = timeit(f"msm_g1 A ({prover.a_pts.shape[0]}pts)",
                prover._msm_g1_jit, wa, prover.a_pts)
    pb1 = timeit("msm_g1 B1", prover._msm_g1_jit, ws, prover.b1_pts)
    pb = timeit(f"msm_g2 B2 ({prover.b2_pts.shape[0]}pts)",
                prover._msm_g2_jit, ws, prover.b2_pts)

    rs = limbs.mont_mul(limbs.to_mont(r_arr), s_arr)
    neg_rs = limbs.canon(limbs.sub(jnp.zeros_like(rs), rs), limbs.FR)
    c_scalars = jnp.concatenate(
        [w_plain[..., npub + 1:, :], q_plain, neg_rs[..., None, :]], axis=-2)
    pc = timeit(f"msm_g1 C ({prover.c_pts.shape[0]}pts)",
                prover._msm_g1_jit, c_scalars, prover.c_pts)
    timeit("assemble", prover._assemble_jit, pa, pb1, pb, pc, r_arr, s_arr)


if __name__ == "__main__":
    main()

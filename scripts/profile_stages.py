"""Per-stage timing of the device prover on the real chip.

Times each jitted stage (witness / quotient / MSMs / assemble) separately
after warm-up, to direct optimization effort.  Not part of the test suite.

Env: BENCH_NLEVELS (default 16), BENCH_BATCH (16), BENCH_ITERS (3).
"""
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


from zkfranchise_tpu.utils.metrics import force


def main():
    import jax
    import jax.numpy as jnp
    from zkfranchise_tpu.groth16.device import DeviceProver, neg_rs_scalar
    from zkfranchise_tpu.models.census import CensusCircuit

    import bench as benchmod

    circuit = CensusCircuit(N_LEVELS)
    pk, vk = benchmod.get_or_make_setup(circuit)
    arrs = benchmod.get_or_make_inputs()
    prover = DeviceProver(circuit, pk)
    print(f"# nvars={pk.n_vars} npub={pk.n_public} domain={pk.domain}",
          file=sys.stderr)
    print(f"# a_tab={prover.a_tab.shape} c_tab={prover.c_tab.shape}",
          file=sys.stderr)

    r_arr, s_arr = benchmod.prover_rs(prover, seed=3)

    def timeit(name, fn, *args):
        out = fn(*args)
        force(out)
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(*args)
        force(out)
        dt = (time.time() - t0) / ITERS
        print(f"{name:28s} {dt*1e3:10.1f} ms")
        return out

    w, w_plain = timeit("witness", prover._witness_jit, arrs)
    q_plain = timeit("quotient(spmv+ntt)", prover._quotient_jit, w)

    npub = prover.pk_meta[1]
    wa = jnp.concatenate([w_plain, r_arr[None]], axis=0)
    ws = jnp.concatenate([w_plain, s_arr[None]], axis=0)
    ws_b = ws[jnp.asarray(prover.b_nz)]
    pa = timeit(f"msm_g1 A ({prover.a_tab.shape[0]}pts)",
                prover._msm, wa, "a")
    pb1 = timeit(f"msm_g1 B1 ({prover.b1_tab.shape[0]}pts)",
                 prover._msm, ws_b, "b1")
    pb = timeit(f"msm_g2 B2 ({prover.b2_tab.shape[0]}pts)",
                prover._msm, ws_b, "b2")

    neg_rs = neg_rs_scalar(r_arr, s_arr)
    c_scalars = jnp.concatenate(
        [w_plain[npub + 1:], q_plain, neg_rs[None]], axis=0)
    pc = timeit(f"msm_g1 C ({prover.c_tab.shape[0]}pts)",
                prover._msm, c_scalars, "c")
    timeit("assemble", prover._assemble_jit, pa, pb1, pb, pc, r_arr, s_arr)


if __name__ == "__main__":
    main()

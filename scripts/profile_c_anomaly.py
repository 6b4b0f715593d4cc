"""Why does the C MSM cost ~2x its chunk-profile prediction?

Times each chunk of the A and C MSMs with the REAL bench scalars and
tables, plus the combine stage, isolating content/layout effects the
synthetic chunk profile can't see.
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

import bench as benchmod
from zkfranchise_tpu.groth16.device import DeviceProver, neg_rs_scalar
from zkfranchise_tpu.models.census import CensusCircuit
from zkfranchise_tpu.ops import msm_lm
from zkfranchise_tpu.utils.metrics import force

N_LEVELS = int(os.environ.get("BENCH_NLEVELS", "16"))


def timeit(name, fn, *args, reps=2):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        force(out)
    dt = (time.time() - t0) / reps
    print(f"{name:40s} {dt:8.3f} s", flush=True)
    return out


def main():
    circuit = CensusCircuit(N_LEVELS)
    pk, _vk = benchmod.get_or_make_setup(circuit)
    arrs = benchmod.get_or_make_inputs()
    prover = DeviceProver(circuit, pk)
    r_arr, s_arr = benchmod.prover_rs(prover, seed=3)
    w, w_plain = prover._witness_jit(arrs)
    q_plain = prover._quotient_jit(w)
    npub = prover.pk_meta[1]
    wa = jnp.concatenate([w_plain, r_arr[None]], axis=0)
    neg_rs = neg_rs_scalar(r_arr, s_arr)
    c_scalars = jnp.concatenate(
        [w_plain[npub + 1:], q_plain, neg_rs[None]], axis=0)
    force((wa, c_scalars))

    for key, scal in (("a", wa), ("c", c_scalars)):
        plan, tabs, kind = prover._msm_plans[key]
        print(f"# {key}: plan={plan}")
        ws = []
        for (s, r, m), tab in zip(plan, tabs):
            sc, _ = msm_lm.pad_chunk(scal, None, s, r, m, kind)
            force(sc)
            w_ = timeit(f"{key} chunk m={m}", prover._chunk_jit, sc, tab,
                        kind)
            ws.append(w_)
        timeit(f"{key} combine", prover._combine_jit, ws, kind,
               scal.shape[-1])
        timeit(f"{key} full _msm", prover._msm, scal, key)


if __name__ == "__main__":
    main()

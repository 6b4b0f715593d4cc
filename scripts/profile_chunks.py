"""Per-chunk MSM cost on the real chip: is the m=4096 chunk really more
expensive than m=8192?  (r5: C-MSM = 8192+4096 chunks costs 7.9 s vs
A = 8192+2048 at 4.4 s — superlinear in the small chunk.)"""
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

from zkfranchise_tpu.ops import ec_affine, msm_lm
from zkfranchise_tpu.utils.metrics import force

B = int(os.environ.get("PROF_B", "128"))
KIND = os.environ.get("PROF_KIND", "g1")

jit_chunk = jax.jit(msm_lm.chunk_window_sums, static_argnums=(2,))


def bench_m(m, reps=3):
    rng = np.random.default_rng(m)
    sc = jnp.asarray(rng.integers(0, 1 << 13, (m, 21, B), dtype=np.int32))
    tab = jnp.asarray(rng.integers(0, 1 << 12,
                                   (m, ec_affine.AROWS[KIND]),
                                   dtype=np.int32))
    out = jit_chunk(sc, tab, KIND)
    force(out)
    t0 = time.time()
    for _ in range(reps):
        out = jit_chunk(sc, tab, KIND)
        force(out)
    dt = (time.time() - t0) / reps
    print(f"m={m:6d}  {dt:8.3f} s   {dt/(32*m*B)*1e9:7.2f} ns/lane-add",
          flush=True)
    return dt


def main():
    print(f"# backend={jax.default_backend()} kind={KIND} B={B}")
    for m in (2048, 4096, 8192):
        bench_m(m)


if __name__ == "__main__":
    main()

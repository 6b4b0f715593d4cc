"""MSM sub-stage profiler (real chip): where do the MSM seconds go?

Times CUMULATIVE variants of msm_lm._window_sums (sort | +gather |
+upsweep | full) at the bench shapes; differences isolate each stage.
Synthetic limb data (arithmetic cost is data-independent).

Env: PROF_M (default 8192), PROF_B (128), PROF_KIND (g1), PROF_ITERS (2).
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

from zkfranchise_tpu.ops import ec_affine, ec_lm, lm, msm_lm
from zkfranchise_tpu.ops.pallas import lm_kernels as K

M = int(os.environ.get("PROF_M", "8192"))
B = int(os.environ.get("PROF_B", "128"))
KIND = os.environ.get("PROF_KIND", "g1")
ITERS = int(os.environ.get("PROF_ITERS", "2"))
NW = msm_lm.N_WINDOWS
NM = msm_lm.N_MAGS


def force(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
        force(out)
    dt = (time.time() - t0) / ITERS
    print(f"{name:24s} {dt*1e3:10.1f} ms")
    return dt


@functools.partial(jax.jit, static_argnums=(3, 4))
def staged(signs, mags, table_ext, stage, G):
    rows = ec_lm.G1_ROWS if KIND == "g1" else ec_lm.G2_ROWS
    m = M
    log_m = m.bit_length() - 1
    br = jnp.asarray(msm_lm._bitrev(m))

    def group_body(_, sd):
        sg, d = sd
        order = jnp.argsort(d, axis=-1).astype(jnp.int32)
        d_sorted = jnp.take_along_axis(d, order, axis=-1)
        perm = order[..., br]
        sg_fold = jnp.take_along_axis(sg, perm, axis=-1)
        idx = (perm + m * sg_fold).reshape(G * B, m)
        if stage == "sort":
            return None, (d_sorted.sum() + idx.sum()).reshape(1)
        pts = table_ext[idx]
        x = jnp.swapaxes(pts, -1, -2)
        if stage == "gather":
            return None, x.sum().reshape(1)
        levels = [x]
        while x.shape[-1] > 1:
            x = K.fold_padd(x, KIND)
            levels.append(x)
        total = levels[-1]
        if stage == "upsweep":
            return None, total.sum().reshape(1)
        buckets = jnp.arange(NM, dtype=jnp.int32)
        counts = jax.vmap(
            lambda row: jnp.searchsorted(row, buckets, side="right"))(
            d_sorted.reshape(G * B, m)).astype(jnp.int32)
        acc = jnp.asarray(K.identity_plane(KIND, (G * B,), NM))
        remaining = counts
        offset = jnp.zeros_like(counts)
        for lvl in range(log_m, -1, -1):
            take = (remaining >> lvl) & 1
            blk = offset >> lvl
            src = msm_lm._bitrev_traced(blk, log_m - lvl)
            node = jnp.take_along_axis(levels[lvl], src[:, None, :], axis=-1)
            added = K.padd(acc, node, KIND)
            acc = jnp.where((take == 1)[:, None, :], added, acc)
            offset = offset + (take << lvl)
        u = msm_lm._tree_reduce_lanes(acc, KIND)
        t128 = msm_lm._double_k(total, msm_lm.WBITS - 1, KIND)
        w = K.padd(t128, msm_lm._neg_plane(u, KIND), KIND)
        return None, w.reshape(G, B, rows, 1)

    shape_g = (NW // G, G, B, M)
    _, out = jax.lax.scan(group_body, None,
                          (signs.reshape(shape_g), mags.reshape(shape_g)))
    return out


def main():
    print(f"# backend={jax.default_backend()} kind={KIND} m={M} B={B}")
    rng = np.random.default_rng(0)
    arows = ec_affine.AROWS[KIND]
    signs = jnp.asarray(rng.integers(0, 2, (NW, B, M), dtype=np.int32))
    mags = jnp.asarray(rng.integers(0, NM + 1, (NW, B, M), dtype=np.int32))
    table_ext = jnp.asarray(
        rng.integers(0, 1 << 13, (2 * M, ec_lm.G1_ROWS if KIND == "g1"
                                  else ec_lm.G2_ROWS), dtype=np.int32))
    G = max(1, min(8, 128 // B)) if K.on_tpu() else NW

    times = {}
    prev = 0.0
    for stage in ["sort", "gather", "upsweep", "full"]:
        dt = timeit(stage, staged, signs, mags, table_ext, stage, G)
        times[stage] = dt
        print(f"    delta {stage:12s} {(dt-prev)*1e3:10.1f} ms")
        prev = dt

    # microbenches
    rows = ec_lm.G1_ROWS if KIND == "g1" else ec_lm.G2_ROWS
    x = jnp.asarray(rng.integers(0, 1 << 13, (B, rows, M), dtype=np.int32))
    f = jax.jit(lambda v: K.fold_padd(v, KIND))
    dt = timeit("fold_padd 1lvl", f, x)
    print(f"    ns/lane-padd: {dt / (B * M / 2) * 1e9:.1f}")
    a = jnp.asarray(rng.integers(0, 1 << 13, (B, 21, M), dtype=np.int32))
    f2 = jax.jit(lambda u, v: K.mont_mul(u, v, lm.FQ))
    dt = timeit("mont_mul", f2, a, a)
    print(f"    ns/mul: {dt / (B * M) * 1e9:.2f}")


if __name__ == "__main__":
    main()

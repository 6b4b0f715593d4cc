"""Benchmark: batched zkCensus Groth16 proving throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): >= 1000 proofs/sec at nlevels=16 on a v5e-16 slice
== 62.5 proofs/sec/chip.  vs_baseline = measured per-chip proofs/sec / 62.5.

The run proves a real batch (shared census/SIK trees, per-voter Merkle
proofs), and verifies one sampled proof against the dev verification key to
guard against benchmarking a broken pipeline.
"""
import json
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
sys.path.insert(0, str(ROOT))

N_LEVELS = int(os.environ.get("BENCH_NLEVELS", "16"))
# voters ride the 128-wide lane axis of every plane: batch=128 runs the
# witness/NTT/assemble stages at full lane utilization (batch=16 idles 7/8)
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))
BASELINE_PER_CHIP = 1000.0 / 16.0


def get_or_make_setup(circuit):
    from zkfranchise_tpu.groth16 import setup as gsetup
    from zkfranchise_tpu.groth16.verify import VerifyingKey

    d = ROOT / "artifacts" / "zkCensus" / "dev" / str(N_LEVELS)
    pk_path = d / "proving_key.pkl"
    vk_path = d / "verification_key.json"
    if pk_path.exists() and vk_path.exists():
        pk = gsetup.ProvingKey.load(pk_path)
        vk = VerifyingKey(json.load(open(vk_path)))
        return pk, vk
    zkey_path = d / "proving_key.zkey"
    if zkey_path.exists() and vk_path.exists():
        # self-exported snarkjs-container key (dev/160 ships only the
        # .zkey): ingest through the interop path, cache as pkl
        from zkfranchise_tpu.utils import serialize, zkey_compat
        t0 = time.time()
        pk, _vk = zkey_compat.pk_from_zkey(
            serialize.read_zkey(zkey_path.read_bytes()))
        print(f"# zkey ingested in {time.time()-t0:.0f}s", file=sys.stderr)
        pk.save(pk_path)
        return pk, VerifyingKey(json.load(open(vk_path)))
    t0 = time.time()
    pk, vk = gsetup.dev_setup(circuit.cs)
    pk.save(pk_path)
    with open(vk_path, "w") as f:
        json.dump(vk.to_dict(), f, indent=1)
    print(f"# setup generated in {time.time()-t0:.0f}s", file=sys.stderr)
    return pk, vk


def get_or_make_inputs():
    import numpy as np
    from zkfranchise_tpu import inputs as inp

    cache = ROOT / "artifacts" / "zkCensus" / "dev" / str(N_LEVELS) / \
        f"bench_inputs_lm_{BATCH}.npz"
    if cache.exists():
        data = np.load(cache)
        return {k: data[k] for k in data.files}
    t0 = time.time()
    batch = inp.mock_batch(N_LEVELS, BATCH, seed=7)
    arrs = inp.batch_to_arrays(batch, N_LEVELS)
    cache.parent.mkdir(parents=True, exist_ok=True)
    np.savez(cache, **arrs)
    print(f"# inputs generated in {time.time()-t0:.0f}s", file=sys.stderr)
    return arrs


def force(out):
    """See zkfranchise_tpu.utils.metrics.force — the ONLY correct way to
    synchronize timing on this backend (block_until_ready does not wait
    over the axon tunnel)."""
    from zkfranchise_tpu.utils.metrics import force as _force
    _force(out)


def main():
    import jax
    from zkfranchise_tpu.groth16 import verify as gverify
    from zkfranchise_tpu.groth16.device import DeviceProver
    from zkfranchise_tpu.models.census import CensusCircuit

    circuit = CensusCircuit(N_LEVELS)
    pk, vk = get_or_make_setup(circuit)
    arrs = get_or_make_inputs()
    prover = DeviceProver(circuit, pk)

    # warm-up / compile
    t0 = time.time()
    proofs, pubs = prover.prove_batch(arrs, seed=1)
    print(f"# warm-up (incl. compile): {time.time()-t0:.1f}s",
          file=sys.stderr)

    ok = gverify.verify(vk, proofs[0], pubs[0])
    print(f"# sample proof verifies: {ok}", file=sys.stderr)

    # per-stage breakdown (1 iter each, after warm-up) — written to
    # bench_stages.json next to this file for the roofline analysis
    stages = stage_breakdown(prover, arrs)
    print(f"# stages: {json.dumps(stages)}", file=sys.stderr)
    suffix = "" if N_LEVELS == 16 else f"_{N_LEVELS}"
    with open(ROOT / f"bench_stages{suffix}.json", "w") as f:
        json.dump({"nlevels": N_LEVELS, "batch": BATCH, **stages}, f, indent=1)

    t0 = time.time()
    for i in range(ITERS):
        pa, pb, pc, publics = prover.prove_arrays(
            arrs, *prover_rs(prover, seed=2 + i))
        force((pa, pb, pc, publics))
    dt = time.time() - t0
    proofs_per_sec = BATCH * ITERS / dt

    result = {
        "metric": f"zkCensus proofs/sec nlevels={N_LEVELS} single-chip "
                  f"batch={BATCH}",
        "value": round(proofs_per_sec, 3),
        "unit": "proofs/s",
        "vs_baseline": round(proofs_per_sec / BASELINE_PER_CHIP, 4),
        "verified": bool(ok),
        "msm_mpoints_per_s": stages.get("msm_mpoints_per_s"),
    }
    print(json.dumps(result))


def stage_breakdown(prover, arrs):
    """Times each jitted stage; returns seconds per stage + MSM Mpoints/s
    (points x proof-lanes per second across the 4 MSMs)."""
    import jax
    import jax.numpy as jnp
    from zkfranchise_tpu.groth16.device import neg_rs_scalar

    r_arr, s_arr = prover_rs(prover, seed=3)
    out = {}

    def timeit(name, fn, *args):
        """Times the SECOND run (first is warm-up); frees the warm-up
        result before the timed run and tolerates per-stage OOM (the
        nlevels=160 config sits near the HBM limit — a failed timing
        must not lose the whole artifact)."""
        try:
            res = fn(*args)
            force(res)
            del res
            t0 = time.time()
            res = fn(*args)
            force(res)
            out[name] = round(time.time() - t0, 4)
            return res
        except Exception as e:                      # noqa: BLE001
            out[name] = None
            print(f"# stage {name} failed: {str(e)[:120]}",
                  file=sys.stderr)
            return fn(*args)

    w, w_plain = prover._witness_jit(arrs)
    q_plain = prover._quotient_jit(w)
    force(q_plain)
    npub = prover.pk_meta[1]
    wa = jnp.concatenate([w_plain, r_arr[None]], axis=0)
    ws = jnp.concatenate([w_plain, s_arr[None]], axis=0)
    ws_b = ws[jnp.asarray(prover.b_nz)]
    pa = timeit("msm_a_s", prover._msm, wa, "a")
    pb1 = timeit("msm_b1_s", prover._msm, ws_b, "b1")
    pb = timeit("msm_b2_s", prover._msm, ws_b, "b2")
    neg_rs = neg_rs_scalar(r_arr, s_arr)
    c_scalars = jnp.concatenate(
        [w_plain[npub + 1:], q_plain, neg_rs[None]], axis=0)
    pc = timeit("msm_c_s", prover._msm, c_scalars, "c")
    timeit("assemble_s", prover._assemble_jit, pa, pb1, pb, pc, r_arr, s_arr)
    del pa, pb1, pb, pc, wa, ws, ws_b, c_scalars, q_plain
    timeit("witness_s", prover._witness_jit, arrs)
    timeit("quotient_s", prover._quotient_jit, w)

    msm_pts = (prover.a_tab.shape[0] + 2 * prover.b1_tab.shape[0]
               + prover.c_tab.shape[0]) * BATCH
    msm_keys = ("msm_a_s", "msm_b1_s", "msm_b2_s", "msm_c_s")
    msm_t = sum(out.get(k) or 0 for k in msm_keys)
    out["msm_mpoints_per_s"] = round(msm_pts / msm_t / 1e6, 3) \
        if msm_t and all(out.get(k) for k in msm_keys) else None
    return out


def prover_rs(prover, seed):
    import jax.numpy as jnp
    import numpy as np
    from zkfranchise_tpu.ops import ff, lm

    rng = np.random.default_rng(seed)
    r = [int.from_bytes(rng.bytes(31), "big") % ff.P_FR for _ in range(BATCH)]
    s = [int.from_bytes(rng.bytes(31), "big") % ff.P_FR for _ in range(BATCH)]
    return (jnp.asarray(lm.ints_to_lm(r)), jnp.asarray(lm.ints_to_lm(s)))


if __name__ == "__main__":
    main()

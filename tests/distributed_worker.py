"""Worker process for the 2-process jax.distributed CPU test.

Usage: python distributed_worker.py <coordinator_port> <process_id> <out>

Each of the 2 processes hosts ONE CPU device (2 global), builds the
global (data=2 x model=1) mesh, runs ONE fused sharded proving step at
nlevels=2 over a 4-voter batch (2 voters addressable per process),
verifies ITS local proofs against the dev verification key, checks a
small explicit cross-process psum over the data axis, and writes a JSON
result file the parent test asserts on.

Scale note: the box has 2 physical cores and the CPU collective
backend's (Gloo) rendezvous times out at 30 s per context.  The fused
prove at model>1 creates many contexts whose inits race against
minutes of per-device compute on starved cores, so THIS test scopes the
prove to data-parallel (model=1: cross-process sharding, global arrays,
SPMD dispatch, per-process verification) and exercises the actual
cross-process collective with a small dedicated psum program; model-axis
collectives (sharded MSM combine, distributed NTT all_to_all) are
covered on the single-process 8-virtual-device mesh
(tests/test_device_prover.py, tests/test_ntt_dist.py, the driver
dryrun) where rendezvous cannot starve.
"""
import json
import os
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

# platform/device env is set by the SPAWNING test (_worker_env) — the
# image's sitecustomize imports jax before this line runs
assert os.environ.get("JAX_PLATFORMS") == "cpu", "spawn via the test"


import jax
import jax.numpy as jnp
import numpy as np

from zkfranchise_tpu import inputs as inp
from zkfranchise_tpu.groth16 import setup as gsetup
from zkfranchise_tpu.groth16 import verify as gverify
from zkfranchise_tpu.models.census import CensusCircuit
from zkfranchise_tpu.ops import ec_lm, lm
from zkfranchise_tpu.parallel import runtime
from zkfranchise_tpu.parallel.prove import ShardedProver

NL = 2
B = 4


def main():
    assert runtime.init_distributed(f"localhost:{port}", 2, pid)
    info = runtime.process_info()
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 2, info
    mesh = runtime.global_mesh(n_model=1)

    circuit = CensusCircuit(NL)
    # dev_setup is deterministic from the seed: both processes derive
    # the IDENTICAL tiny proving key locally (seconds at nlevels=2)
    pk, vk = gsetup.dev_setup(circuit.cs)
    prover = ShardedProver(circuit, pk, mesh)

    arrs = inp.batch_to_arrays(inp.mock_batch(NL, B, seed=3), NL)
    rng = np.random.default_rng(7)
    r_np = np.asarray(lm.ints_to_lm(
        [int(x) for x in rng.integers(1, 2**62, size=B)]))
    s_np = np.asarray(lm.ints_to_lm(
        [int(x) for x in rng.integers(1, 2**62, size=B)]))

    # every process holds the same full-batch numpy; shard it into
    # global arrays along the mesh axes the fused program expects
    from zkfranchise_tpu.parallel.prove import _IN_KEYS, _in_spec
    g_arrs = {k: runtime.make_global(np.asarray(arrs[k]), mesh, _in_spec(k))
              for k in _IN_KEYS}
    from jax.sharding import PartitionSpec as P
    r_g = runtime.make_global(r_np, mesh, P(None, "data"))
    s_g = runtime.make_global(s_np, mesh, P(None, "data"))

    # STAGGERED compile, then a barrier before the first collective:
    # (a) this box has 2 cores — two processes compiling the same big
    # program simultaneously starve the coordination service and the
    # Gloo rendezvous (30 s timeouts); (b) process 0 compiles first and
    # populates the persistent cache, so process 1's compile is a cache
    # hit; (c) both meet at a barrier so execution (and Gloo context
    # init) starts in lockstep.
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    if pid == 0:
        prover.prove_fused(g_arrs, r_g, s_g, compile_only=True)
    client.wait_at_barrier("zkf_c0", 2400_000)
    if pid != 0:
        prover.prove_fused(g_arrs, r_g, s_g, compile_only=True)
    client.wait_at_barrier("zkf_c1", 2400_000)
    pa, pb, pc, publics = prover.prove_fused(g_arrs, r_g, s_g)

    # explicit cross-process collective: psum over the data axis (one
    # 2-member Gloo group spanning both processes, sub-second program)
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P2
    xs = runtime.make_global(np.arange(8, dtype=np.int32), mesh,
                             P2("data"))
    total = jax.jit(shard_map(
        lambda v: jax.lax.psum(v.sum(), "data"),
        mesh=mesh, in_specs=P2("data"), out_specs=P2()))(xs)
    psum_ok = int(np.asarray(total.addressable_shards[0].data)) == 28

    # each process reads ONLY its addressable voter lanes; the lane
    # shards are replicated over 'model' (4 devices hold the same data
    # shard) — dedupe by lane index
    def local_lanes(garr):
        seen = {}
        for s in garr.addressable_shards:
            key = int(s.index[-1].start or 0)
            if key not in seen:
                seen[key] = np.asarray(s.data)
        cols = sorted(seen)
        return np.concatenate([seen[c] for c in cols],
                              axis=-1), cols[0], garr.shape[-1]

    pa_l, col0, _ = local_lanes(pa)
    pb_l, _, _ = local_lanes(pb)
    pc_l, _, _ = local_lanes(pc)
    pub_l, _, _ = local_lanes(publics)

    a_aff = ec_lm.g1_plane_to_affine(pa_l)
    b_aff = ec_lm.g2_plane_to_affine(pb_l)
    c_aff = ec_lm.g1_plane_to_affine(pc_l)
    nloc = pa_l.shape[-1]
    flat = lm.lm_to_ints(pub_l)                    # signal-major
    npub = pub_l.shape[0]
    ok = []
    for j in range(nloc):
        proof = gverify.Proof({
            "pi_a": [str(a_aff[j][0]), str(a_aff[j][1]), "1"],
            "pi_b": [[str(b_aff[j][0][0]), str(b_aff[j][0][1])],
                     [str(b_aff[j][1][0]), str(b_aff[j][1][1])],
                     ["1", "0"]],
            "pi_c": [str(c_aff[j][0]), str(c_aff[j][1]), "1"]})
        signals = [flat[i * nloc + j] for i in range(npub)]
        ok.append(bool(gverify.verify(vk, proof, signals)))

    json.dump({"process": pid, "first_voter": col0, "n_local": nloc,
               "verified": ok, "psum_ok": psum_ok}, open(out_path, "w"))
    print(f"worker {pid}: voters {col0}..{col0 + nloc - 1} verified={ok}",
          flush=True)
    # meet once more so neither process dies while the other still has
    # collectives in flight (peer death poisons the coordination
    # client), then hard-exit to skip the interpreter-exit shutdown
    # barrier race entirely
    client.wait_at_barrier("zkf_done", 2400_000)
    os._exit(0)


if __name__ == "__main__":
    main()

"""End-to-end client example — the ts_inputs/src/example.ts equivalent.

Mirrors the reference's `npm run example` flow
(/root/reference/ts_inputs/src/example.ts): assemble circuit inputs from
API-provided census data, produce a Groth16 proof, print the wall-clock,
verify.  Here the whole pipeline is native (no wasm/zkey files needed
beyond the framework's own dev artifacts).

Run: python -m examples.client_prove [--nlevels 16] [--batch 4]
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlevels", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    from zkfranchise_tpu import inputs as inp
    from zkfranchise_tpu.groth16 import setup as gsetup
    from zkfranchise_tpu.groth16 import verify as gverify
    from zkfranchise_tpu.groth16.device import DeviceProver
    from zkfranchise_tpu.models.census import CensusCircuit

    nl = args.nlevels
    circuit = CensusCircuit(nl)
    art = pathlib.Path("artifacts/zkCensus/dev") / str(nl)
    pk_path = art / "proving_key.pkl"
    if pk_path.exists():
        pk = gsetup.ProvingKey.load(pk_path)
        vk = gverify.VerifyingKey(
            json.load(open(art / "verification_key.json")))
    else:
        print("running dev setup...")
        pk, vk = gsetup.dev_setup(circuit.cs)
        pk.save(pk_path)
        with open(art / "verification_key.json", "w") as f:
            json.dump(vk.to_dict(), f, indent=1)

    print(f"building census for {args.batch} voters...")
    voters = inp.mock_batch(nl, args.batch, seed=11)
    arrs = inp.batch_to_arrays(voters, nl)

    prover = DeviceProver(circuit, pk)
    t0 = time.time()
    proofs, pubs = prover.prove_batch(arrs)
    print(f"proof took {time.time() - t0:.1f}s "
          f"({args.batch} proofs, incl. compile on first run)")

    for i, (proof, pub) in enumerate(zip(proofs, pubs)):
        ok = gverify.verify(vk, proof, pub)
        print(f"proof {i}: verifies={ok}")
        assert ok
    # write the reference-format artifacts for the first proof
    from zkfranchise_tpu.utils import artifacts as arts
    arts.save_proof_artifacts(art, proofs[0].to_dict(), pubs[0])
    (art / "inputs_example.json").write_text(voters[0].to_json())
    print(f"artifacts written to {art}")


if __name__ == "__main__":
    main()

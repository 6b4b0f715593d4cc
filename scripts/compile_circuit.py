"""Circuit 'compilation': build the R1CS + dev trusted setup + artifacts.

Native replacement for the reference's make compile pipeline
(/root/reference/circuit/circuit-compiler.sh): instead of circom+snarkjs
child processes, builds the constraint system in-process, runs the
deterministic dev setup (C++-accelerated keygen), and writes
proving_key.pkl / proving_key.zkey / verification_key.json plus the
sha256 manifest.
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlevels", type=int, default=16)
    ap.add_argument("--env", default="dev")
    ap.add_argument("--name", default="zkCensus")
    ap.add_argument("--seed", default="zkfranchise-dev-setup")
    args = ap.parse_args()

    from zkfranchise_tpu.groth16 import qap, setup as gsetup
    from zkfranchise_tpu.models.census import CensusCircuit
    from zkfranchise_tpu.utils import artifacts, serialize

    t0 = time.time()
    circ = CensusCircuit(args.nlevels)
    cs = circ.cs
    print(f"R1CS built: {cs.num_vars} wires, {cs.num_constraints} "
          f"constraints, domain {qap.domain_size(cs.num_constraints, cs.num_public)} "
          f"({time.time()-t0:.1f}s)")
    t0 = time.time()
    pk, vk = gsetup.dev_setup(cs, seed=args.seed.encode())
    print(f"setup done ({time.time()-t0:.1f}s)")

    out = pathlib.Path("artifacts") / args.name / args.env / str(args.nlevels)
    out.mkdir(parents=True, exist_ok=True)
    pk.save(out / "proving_key.pkl")
    with open(out / "verification_key.json", "w") as f:
        json.dump(vk.to_dict(), f, indent=1)
    # snarkjs-format zkey export (our canonical wire layout)
    rows = list(cs.constraints) + qap.binding_rows(cs.num_public)
    coeffs = []
    for r, (a, b, c) in enumerate(rows):
        for idx, cf in a.items():
            coeffs.append((0, r, idx, cf))
        for idx, cf in b.items():
            coeffs.append((1, r, idx, cf))
    z = serialize.ZkeyData(
        n_vars=pk.n_vars, n_public=pk.n_public, domain=pk.domain,
        alpha_g1=pk.alpha_g1, beta_g1=pk.beta_g1, beta_g2=pk.beta_g2,
        gamma_g2=vk.gamma_2, delta_g1=pk.delta_g1, delta_g2=pk.delta_g2,
        ic=vk.ic, coeffs=coeffs, a_g1=pk.a_g1, b_g1=pk.b_g1,
        b_g2=pk.b_g2, c_g1=pk.k_g1, h_g1=pk.h_g1)
    (out / "proving_key.zkey").write_bytes(serialize.write_zkey(z))
    artifacts.write_manifest(out.parent)
    print(f"artifacts written to {out}")


if __name__ == "__main__":
    main()

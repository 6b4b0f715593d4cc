"""zkfranchise_tpu — TPU-native zkSNARK census-proof framework.

A from-scratch JAX/XLA/Pallas re-implementation of the capabilities of
vocdoni/zk-franchise-proof-circuit: BN254 field & curve arithmetic, Poseidon
hashing, arbo-compatible sparse Merkle trees, a native R1CS constraint and
witness builder for the zkCensus circuit family, and a full Groth16
prover/verifier — batch-oriented and sharded over TPU device meshes.
"""

__version__ = "0.1.0"

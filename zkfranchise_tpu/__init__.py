"""zkfranchise_tpu — TPU-native zkSNARK census-proof framework.

A from-scratch JAX/XLA/Pallas re-implementation of the capabilities of
vocdoni/zk-franchise-proof-circuit: BN254 field & curve arithmetic, Poseidon
hashing, arbo-compatible sparse Merkle trees, a native R1CS constraint and
witness builder for the zkCensus circuit family, and a full Groth16
prover/verifier — batch-oriented and sharded over TPU device meshes.
"""

__version__ = "0.1.0"

# Enable the persistent compilation cache as early as possible.  This
# environment's sitecustomize imports jax at interpreter start, so the
# JAX_COMPILATION_CACHE_DIR env var set by scripts is read too late;
# updating the config directly works at any point before first compile.
import os as _os

import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                    _os.path.join(_os.path.dirname(_os.path.dirname(
                        _os.path.abspath(__file__))), ".jax_cache")))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

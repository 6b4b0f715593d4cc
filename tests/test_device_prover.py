"""Flagship-path test: TPU (CPU-backend) batched Groth16 prover end-to-end,
and the sharded multi-device variant on the virtual 8-device mesh."""
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkfranchise_tpu import inputs as inp
from zkfranchise_tpu.groth16 import setup as gsetup
from zkfranchise_tpu.groth16 import verify as gverify
from zkfranchise_tpu.groth16.device import DeviceProver
from zkfranchise_tpu.models.census import CensusCircuit
from zkfranchise_tpu.ops import lm

NL = 4
ART = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / \
    "zkCensus" / "dev" / str(NL)


@pytest.fixture(scope="module")
def circuit():
    return CensusCircuit(NL)


@pytest.fixture(scope="module")
def keys(circuit):
    pk_path = ART / "proving_key.pkl"
    if pk_path.exists():
        pk = gsetup.ProvingKey.load(pk_path)
        vk = gverify.VerifyingKey(
            json.load(open(ART / "verification_key.json")))
    else:
        pk, vk = gsetup.dev_setup(circuit.cs)
        pk.save(pk_path)
        with open(ART / "verification_key.json", "w") as f:
            json.dump(vk.to_dict(), f, indent=1)
    return pk, vk


@pytest.fixture(scope="module")
def voter_batch():
    batch = inp.mock_batch(NL, 2, seed=3)
    return inp.batch_to_arrays(batch, NL)


@pytest.mark.slow
def test_device_prove_batch_verifies(circuit, keys, voter_batch):
    pk, vk = keys
    # compile_friendly: the rolled-loop MSM keeps CPU test compiles bounded;
    # the production Blelloch path is covered by tests/test_device_kernels
    # and by bench.py's on-hardware verification
    prover = DeviceProver(circuit, pk, compile_friendly=True)
    proofs, pubs = prover.prove_batch(voter_batch, seed=11)
    assert len(proofs) == 2
    for proof, pub in zip(proofs, pubs):
        assert gverify.verify(vk, proof, pub)
    # proofs are bound to their own publics, not each other's
    assert not gverify.verify(vk, proofs[0], pubs[1])


@pytest.mark.slow
def test_sharded_prover_matches(circuit, keys, voter_batch):
    """8 virtual devices: (data=2, model=4) mesh; same proofs must verify."""
    from zkfranchise_tpu.parallel.mesh import make_mesh
    from zkfranchise_tpu.parallel.prove import ShardedProver

    pk, vk = keys
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_model=4)
    sp = ShardedProver(circuit, pk, mesh)
    r = jnp.asarray(lm.ints_to_lm([5, 6]))
    s = jnp.asarray(lm.ints_to_lm([7, 8]))
    pa, pb, pc, publics = sp.prove_batch_arrays(voter_batch, r, s)
    dp = DeviceProver(circuit, pk)
    proofs, pubs = dp.finalize(pa, pb, pc, publics)
    for proof, pub in zip(proofs, pubs):
        assert gverify.verify(vk, proof, pub)

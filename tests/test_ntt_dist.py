"""Distributed four-step NTT (ops/ntt_dist.py) vs the local oracle
(ops/ntt.py), on the virtual CPU mesh: 2/4/8-way domain sharding with
all_to_all stage exchanges."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from zkfranchise_tpu.groth16 import poly
from zkfranchise_tpu.ops import ff, lm, ntt, ntt_dist
from zkfranchise_tpu.ops.lm import FR

RNG = np.random.default_rng(9)


def _rand_mont(n, T):
    vals = [[int.from_bytes(RNG.bytes(32), "big") % ff.P_FR
             for _ in range(T)] for _ in range(n)]
    x = jnp.asarray(np.stack([lm.ints_to_lm(row) for row in vals]))
    return lm.to_mont(x, FR)


def _mesh(nm):
    devs = np.asarray(jax.devices()[:nm])
    return Mesh(devs, ("model",))


def _run_sharded(fn, mesh, x):
    sm = shard_map(fn, mesh=mesh, in_specs=(P("model"),),
                   out_specs=P("model"), check_rep=False)
    return jax.jit(sm)(x)


@pytest.mark.parametrize("nm", [2, 4, 8])
def test_coset_evals_dist_matches_local(nm):
    if len(jax.devices()) < nm:
        pytest.skip("needs virtual devices")
    log_n, T = 6, 4
    n = 1 << log_n
    plan = ntt_dist.DistNTTPlan(log_n, nm)
    x = _rand_mont(n, T)

    got = _run_sharded(
        lambda xl: ntt_dist.coset_evals_dist(xl, "model", plan),
        _mesh(nm), x)
    want = ntt.coset_evals_from_domain_evals(x)
    assert lm.lm_to_ints(np.asarray(lm.from_mont(got, FR))) == \
        lm.lm_to_ints(np.asarray(lm.from_mont(want, FR)))


def test_intt_strided_roundtrip():
    """intt_dist -> (unstride) == local intt; ntt_dist inverts it."""
    nm = 4
    if len(jax.devices()) < nm:
        pytest.skip("needs virtual devices")
    log_n, T = 5, 2
    n = 1 << log_n
    plan = ntt_dist.DistNTTPlan(log_n, nm)
    mesh = _mesh(nm)
    x = _rand_mont(n, T)

    def pipeline(xl):
        co = ntt_dist.intt_dist(xl, "model", plan)
        gathered = jax.lax.all_gather(co, "model")          # (nm, b, 21, T)
        natural = ntt_dist.unstride(gathered, nm)
        return natural, ntt_dist.ntt_dist(co, "model", plan)

    sm = shard_map(pipeline, mesh=mesh, in_specs=(P("model"),),
                   out_specs=(P(None), P("model")), check_rep=False)
    coefs, back = jax.jit(sm)(x)
    want_coefs = ntt.ntt(x, inverse=True)
    to_ints = lambda a: lm.lm_to_ints(np.asarray(lm.from_mont(a, FR)))
    assert to_ints(coefs) == to_ints(want_coefs)
    assert to_ints(back) == to_ints(x)

"""TPU Groth16 prover: the flagship batched proving pipeline.

One jitted function takes a BATCH of voters' circuit inputs and produces a
batch of Groth16 proofs: witness generation (models/census.py), R1CS row
evaluation (ops/sparse.py), quotient evaluations via coset NTT (ops/ntt.py),
and five MSMs (ops/msm.py) — everything the reference delegates to
go-rapidsnark/snarkjs (/root/reference/zk_census_test.go:89), re-designed as
a single XLA program over limb arrays.

Blinding (r, s) is folded into the MSMs by extending the scalar/point
tables, so pi_a/pi_b/pi_c come out of three fused MSM calls plus two
batched scalar-muls; only the final projective->affine conversion runs on
host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.census import CensusCircuit
from ..ops import ec_jax, ff, limbs, msm, ntt, sparse
from ..ops.limbs import FR, N_LIMBS
from . import qap
from .setup import ProvingKey
from .verify import Proof

P = ff.P_FR


class DeviceProver:
    """Holds device-resident proving-key tables + the jitted prove step."""

    def __init__(self, circuit: CensusCircuit, pk: ProvingKey):
        self.circuit = circuit
        self.pk_meta = (pk.n_vars, pk.n_public, pk.domain)
        cs = circuit.cs
        self.arrays = cs.export_arrays(
            extra_rows=qap.binding_rows(cs.num_public))
        assert self.arrays["num_constraints"] <= pk.domain

        # device point tables (packed, Montgomery)
        g1pack = lambda pts: msm.pack_g1(ec_jax.g1_from_affine_host(pts))
        g2pack = lambda pts: msm.pack_g2(ec_jax.g2_from_affine_host(pts))
        # A/B1 tables extended with delta for the r/s blinding term
        self.a_pts = g1pack(pk.a_g1 + [pk.delta_g1])
        self.b1_pts = g1pack(pk.b_g1 + [pk.delta_g1])
        self.b2_pts = g2pack(pk.b_g2 + [pk.delta_g2])
        # C table: private wires + H table + delta (for the -rs term)
        self.c_pts = g1pack(pk.k_g1 + pk.h_g1 + [pk.delta_g1])
        self.alpha = ec_jax.g1_from_affine_host([pk.alpha_g1])
        self.beta1 = ec_jax.g1_from_affine_host([pk.beta_g1])
        self.beta2 = ec_jax.g2_from_affine_host([pk.beta_g2])

        self._prove_jit = jax.jit(self._prove_device)

    # -- device pipeline -----------------------------------------------------
    def _prove_device(self, inputs: dict, r_plain: jnp.ndarray,
                      s_plain: jnp.ndarray):
        """inputs: batched plain limb arrays (see CensusCircuit.witness);
        r/s: (..., 16) plain limb blinding scalars."""
        m, npub, n = self.pk_meta
        w = self.circuit.witness(inputs)                 # (..., m, 16) mont
        w_plain = limbs.from_mont(w)

        a_rows, b_rows, c_rows = (self.arrays[k] for k in ("a", "b", "c"))
        az = sparse.spmv(*a_rows, n, w)
        bz = sparse.spmv(*b_rows, n, w)
        cz = sparse.spmv(*c_rows, n, w)
        a_cos = ntt.coset_evals_from_domain_evals(az)
        b_cos = ntt.coset_evals_from_domain_evals(bz)
        c_cos = ntt.coset_evals_from_domain_evals(cz)
        q = limbs.sub(limbs.mont_mul(a_cos, b_cos), c_cos, FR)
        q_plain = limbs.from_mont(q)

        r1 = r_plain[..., None, :]
        s1 = s_plain[..., None, :]
        pi_a = msm.unpack_g1(msm._msm_packed(
            jnp.concatenate([w_plain, r1], axis=-2), self.a_pts, "g1"))
        pi_a = ec_jax.g1_add(pi_a, _bcast1(self.alpha, pi_a))

        pi_b1 = msm.unpack_g1(msm._msm_packed(
            jnp.concatenate([w_plain, s1], axis=-2), self.b1_pts, "g1"))
        pi_b1 = ec_jax.g1_add(pi_b1, _bcast1(self.beta1, pi_b1))

        pi_b = msm.unpack_g2(msm._msm_packed(
            jnp.concatenate([w_plain, s1], axis=-2), self.b2_pts, "g2"))
        pi_b = ec_jax.g2_add(pi_b, _bcast2(self.beta2, pi_b))

        # -r*s mod p as plain limbs: mont_mul(r*R? ) — compute via to_mont
        rs = limbs.mont_mul(limbs.to_mont(r_plain), s_plain)  # r*s plain
        neg_rs = limbs.sub(jnp.zeros_like(rs), rs, FR)
        c_scalars = jnp.concatenate(
            [w_plain[..., npub + 1:, :], q_plain, neg_rs[..., None, :]],
            axis=-2)
        pi_c = msm.unpack_g1(msm._msm_packed(c_scalars, self.c_pts, "g1"))
        pi_c = ec_jax.g1_add(pi_c, ec_jax.g1_scalar_mul(pi_a, s_plain))
        pi_c = ec_jax.g1_add(pi_c, ec_jax.g1_scalar_mul(pi_b1, r_plain))

        publics = w_plain[..., 1:1 + npub, :]
        return (msm.pack_g1(pi_a), msm.pack_g2(pi_b), msm.pack_g1(pi_c),
                publics)

    # -- host wrapper --------------------------------------------------------
    def prove_batch(self, inputs: dict, seed: int = 0):
        """Returns (proofs: list[Proof], public_signals: list[list[int]])."""
        rng = np.random.default_rng(seed)
        rs_shape = tuple(np.asarray(inputs["address"]).shape[:-1])
        r_int = [int.from_bytes(rng.bytes(31), "big") % P
                 for _ in range(int(np.prod(rs_shape)) if rs_shape else 1)]
        s_int = [int.from_bytes(rng.bytes(31), "big") % P
                 for _ in range(int(np.prod(rs_shape)) if rs_shape else 1)]
        r_arr = jnp.asarray(limbs.ints_to_limbs(r_int)).reshape(
            *rs_shape, N_LIMBS)
        s_arr = jnp.asarray(limbs.ints_to_limbs(s_int)).reshape(
            *rs_shape, N_LIMBS)
        pa, pb, pc, publics = self._prove_jit(inputs, r_arr, s_arr)
        return self.finalize(pa, pb, pc, publics)

    def finalize(self, pa, pb, pc, publics):
        a_aff = ec_jax.g1_to_affine_host(msm.unpack_g1(pa))
        b_aff = ec_jax.g2_to_affine_host(msm.unpack_g2(pb))
        c_aff = ec_jax.g1_to_affine_host(msm.unpack_g1(pc))
        pub_ints = limbs.limbs_to_ints(np.asarray(publics))
        npub = self.pk_meta[1]
        pubs = [pub_ints[i:i + npub] for i in range(0, len(pub_ints), npub)]
        proofs = []
        for a, b, c in zip(a_aff, b_aff, c_aff):
            proofs.append(Proof({
                "pi_a": [str(a[0]), str(a[1]), "1"],
                "pi_b": [[str(b[0][0]), str(b[0][1])],
                         [str(b[1][0]), str(b[1][1])], ["1", "0"]],
                "pi_c": [str(c[0]), str(c[1]), "1"],
            }))
        return proofs, pubs


def _bcast1(pt: ec_jax.G1Point, like: ec_jax.G1Point) -> ec_jax.G1Point:
    return ec_jax.G1Point(
        jnp.broadcast_to(pt.x[0], like.x.shape),
        jnp.broadcast_to(pt.y[0], like.y.shape),
        jnp.broadcast_to(pt.z[0], like.z.shape))


def _bcast2(pt: ec_jax.G2Point, like: ec_jax.G2Point) -> ec_jax.G2Point:
    return ec_jax.G2Point(
        jnp.broadcast_to(pt.x[0], like.x.shape),
        jnp.broadcast_to(pt.y[0], like.y.shape),
        jnp.broadcast_to(pt.z[0], like.z.shape))

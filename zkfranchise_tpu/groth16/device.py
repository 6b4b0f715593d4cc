"""TPU Groth16 prover: the flagship batched proving pipeline.

A batch of voters' circuit inputs goes through four jitted stages:
  1. witness generation (models/census.py),
  2. R1CS row evaluation + coset-NTT quotient (ops/sparse.py, ops/ntt.py),
  3. five MSMs (ops/msm.py) with the r/s blinding folded into extended
     scalar/point tables,
  4. proof assembly (two batched scalar-muls + point adds).

Staged jits keep each XLA program at a compilable size and let the A/B1
MSMs share one compiled executable (same shapes).  This is the work the
reference delegates to go-rapidsnark/snarkjs
(/root/reference/zk_census_test.go:89), re-designed as XLA programs over
limb arrays.  Only the final projective->affine conversion runs on host.
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
    """Holds device-resident proving-key tables + the jitted prove stages."""

    def __init__(self, circuit: CensusCircuit, pk: ProvingKey,
                 compile_friendly: bool = False):
        """compile_friendly selects the rolled-loop MSM scan (small traced
        programs, ~7x more vector work) — for tests/dry-runs on weak hosts;
        production keeps the unrolled Blelloch scan."""
        self.circuit = circuit
        self.compile_friendly = compile_friendly
        self.pk_meta = (pk.n_vars, pk.n_public, pk.domain)
        cs = circuit.cs
        self.arrays = cs.export_arrays(
            extra_rows=qap.binding_rows(cs.num_public))
        assert self.arrays["num_constraints"] <= pk.domain

        g1pack = lambda pts: msm.pack_g1(ec_jax.g1_from_affine_host(pts))
        g2pack = lambda pts: msm.pack_g2(ec_jax.g2_from_affine_host(pts))
        # A/B1 tables extended with delta for the r/s blinding term
        self.a_pts = g1pack(pk.a_g1 + [pk.delta_g1])
        self.b1_pts = g1pack(pk.b_g1 + [pk.delta_g1])
        self.b2_pts = g2pack(pk.b_g2 + [pk.delta_g2])
        # C table: private wires + H table + delta (for the -rs term)
        self.c_pts = g1pack(pk.k_g1 + pk.h_g1 + [pk.delta_g1])
        self.alpha = g1pack([pk.alpha_g1])[0]
        self.beta1 = g1pack([pk.beta_g1])[0]
        self.beta2 = g2pack([pk.beta_g2])[0]

        cf = compile_friendly
        self._witness_jit = jax.jit(self._witness_stage)
        self._quotient_jit = jax.jit(self._quotient_stage)
        # one executable serves both A and B1 (same shapes)
        self._msm_g1_jit = jax.jit(
            lambda sc, pts: msm._msm_packed(sc, pts, "g1",
                                            compile_friendly=cf))
        self._msm_g2_jit = jax.jit(
            lambda sc, pts: msm._msm_packed(sc, pts, "g2",
                                            compile_friendly=cf))
        self._assemble_jit = jax.jit(self._assemble_stage)

    # -- stage 1: witness ----------------------------------------------------
    def _witness_stage(self, inputs: dict):
        w = self.circuit.witness(inputs)
        return w, limbs.from_mont(w)

    # -- stage 2: az/bz/cz + quotient evals ---------------------------------
    def _quotient_stage(self, w: jnp.ndarray):
        n = self.pk_meta[2]
        az = sparse.spmv(*self.arrays["a"], n, w)
        bz = sparse.spmv(*self.arrays["b"], n, w)
        cz = sparse.spmv(*self.arrays["c"], n, w)
        a_cos = ntt.coset_evals_from_domain_evals(az)
        b_cos = ntt.coset_evals_from_domain_evals(bz)
        c_cos = ntt.coset_evals_from_domain_evals(cz)
        # forward-NTT outputs are value-loose; tighten c before it becomes a
        # subtrahend (multiply by the Montgomery one keeps the class)
        c_tight = limbs.mont_mul(c_cos, jnp.asarray(FR.one_mont))
        q = limbs.sub(limbs.mont_mul(a_cos, b_cos), c_tight, FR)
        return limbs.from_mont(q)

    # -- stage 4: blinding combination --------------------------------------
    def _assemble_stage(self, pa, pb1, pb, pc_partial, r_plain, s_plain):
        pi_a = ec_jax.g1_add(msm.unpack_g1(pa), _bcast1(self.alpha, pa))
        pi_b1 = ec_jax.g1_add(msm.unpack_g1(pb1), _bcast1(self.beta1, pb1))
        pi_b = ec_jax.g2_add(msm.unpack_g2(pb), _bcast2(self.beta2, pb))
        pi_c = msm.unpack_g1(pc_partial)
        pi_c = ec_jax.g1_add(pi_c, ec_jax.g1_scalar_mul(pi_a, s_plain))
        pi_c = ec_jax.g1_add(pi_c, ec_jax.g1_scalar_mul(pi_b1, r_plain))
        return msm.pack_g1(pi_a), msm.pack_g2(pi_b), msm.pack_g1(pi_c)

    # -- full pipeline -------------------------------------------------------
    def prove_arrays(self, inputs: dict, r_plain: jnp.ndarray,
                     s_plain: jnp.ndarray):
        """Batched prove; returns packed (pi_a, pi_b, pi_c, publics)."""
        npub = self.pk_meta[1]
        w, w_plain = self._witness_jit(inputs)
        q_plain = self._quotient_jit(w)

        r1 = r_plain[..., None, :]
        s1 = s_plain[..., None, :]
        wa = jnp.concatenate([w_plain, r1], axis=-2)
        ws = jnp.concatenate([w_plain, s1], axis=-2)
        pa = self._msm_g1_jit(wa, self.a_pts)
        pb1 = self._msm_g1_jit(ws, self.b1_pts)
        pb = self._msm_g2_jit(ws, self.b2_pts)

        rs = limbs.mont_mul(limbs.to_mont(r_plain), s_plain)
        neg_rs = limbs.canon(limbs.sub(jnp.zeros_like(rs), rs, FR), FR)
        c_scalars = jnp.concatenate(
            [w_plain[..., npub + 1:, :], q_plain, neg_rs[..., None, :]],
            axis=-2)
        pc_partial = self._msm_g1_jit(c_scalars, self.c_pts)

        pa_f, pb_f, pc_f = self._assemble_jit(pa, pb1, pb, pc_partial,
                                              r_plain, s_plain)
        publics = w_plain[..., 1:1 + npub, :]
        return pa_f, pb_f, pc_f, publics

    # -- host wrapper --------------------------------------------------------
    def prove_batch(self, inputs: dict, seed: int = 0):
        """Returns (proofs: list[Proof], public_signals: list[list[int]])."""
        rng = np.random.default_rng(seed)
        rs_shape = tuple(np.asarray(inputs["address"]).shape[:-1])
        count = int(np.prod(rs_shape)) if rs_shape else 1
        r_int = [int.from_bytes(rng.bytes(31), "big") % P for _ in range(count)]
        s_int = [int.from_bytes(rng.bytes(31), "big") % P for _ in range(count)]
        r_arr = jnp.asarray(limbs.ints_to_limbs(r_int)).reshape(
            *rs_shape, N_LIMBS)
        s_arr = jnp.asarray(limbs.ints_to_limbs(s_int)).reshape(
            *rs_shape, N_LIMBS)
        pa, pb, pc, publics = self.prove_arrays(inputs, r_arr, s_arr)
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


def _bcast1(pt_packed: jnp.ndarray, like_packed: jnp.ndarray) -> ec_jax.G1Point:
    pt = msm.unpack_g1(pt_packed)
    like = msm.unpack_g1(like_packed)
    return ec_jax.G1Point(
        jnp.broadcast_to(pt.x, like.x.shape),
        jnp.broadcast_to(pt.y, like.y.shape),
        jnp.broadcast_to(pt.z, like.z.shape))


def _bcast2(pt_packed: jnp.ndarray, like_packed: jnp.ndarray) -> ec_jax.G2Point:
    pt = msm.unpack_g2(pt_packed)
    like = msm.unpack_g2(like_packed)
    return ec_jax.G2Point(
        jnp.broadcast_to(pt.x, like.x.shape),
        jnp.broadcast_to(pt.y, like.y.shape),
        jnp.broadcast_to(pt.z, like.z.shape))
"""Sharded Groth16 proving step (shard_map over a (data, model) mesh).

Parallel decomposition (SURVEY.md §2c):
  * voter batch sharded over 'data' — witness generation, R1CS rows, NTT
    and the quotient evaluations are embarrassingly parallel per voter;
  * MSM point tables sharded over 'model' — each chip accumulates buckets
    for its slice of the proving key, partial points are combined with an
    all_gather over ICI followed by a log-depth on-chip reduction (EC
    addition is not a psum-able op: limb arrays must be combined with the
    curve group law, so the collective is gather+reduce, not psum).

The same code drives the real pod slice and the driver's virtual-CPU-device
dry run.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.census import CensusCircuit
from ..ops import ec_jax, limbs, msm, ntt, sparse
from ..ops.limbs import FR, N_LIMBS
from ..groth16 import qap


def _pad_rows(arr: jnp.ndarray, mult: int, identity_row: np.ndarray
              ) -> jnp.ndarray:
    n = arr.shape[0]
    m = ((n + mult - 1) // mult) * mult
    if m == n:
        return arr
    pad = jnp.broadcast_to(jnp.asarray(identity_row),
                           (m - n, *identity_row.shape))
    return jnp.concatenate([arr, pad], axis=0)


def _tree_reduce_axis0(pts: jnp.ndarray, padd, pidentity) -> jnp.ndarray:
    while pts.shape[0] > 1:
        if pts.shape[0] % 2:
            pad = jnp.broadcast_to(jnp.asarray(pidentity(())),
                                   (1, *pts.shape[1:]))
            pts = jnp.concatenate([pts, pad], axis=0)
        pts = padd(pts[0::2], pts[1::2])
    return pts[0]


def _sharded_msm(scalars_full: jnp.ndarray, pts_shard: jnp.ndarray,
                 kind: str, shard_size: int, axis: str) -> jnp.ndarray:
    """scalars_full: (..., n_padded, 16) full scalar vector (replicated on
    `axis`); pts_shard: (n_padded/axis_size, C, 16) this chip's slice.
    Returns the full MSM result, identical on every member of `axis`."""
    padd, _, pidentity, _ = msm._OPS[kind]
    idx = jax.lax.axis_index(axis)
    sc = jax.lax.dynamic_slice_in_dim(
        scalars_full, idx * shard_size, shard_size, axis=-2)
    partial = msm._msm_packed(sc, pts_shard, kind)       # (..., C, 16)
    gathered = jax.lax.all_gather(partial, axis)         # (S, ..., C, 16)
    return _tree_reduce_axis0(gathered, padd, pidentity)


class ShardedProver:
    """Multi-chip batched prover: voter DP x proving-key sharding."""

    def __init__(self, circuit: CensusCircuit, pk, mesh: Mesh):
        self.circuit = circuit
        self.mesh = mesh
        self.n_model = mesh.shape["model"]
        cs = circuit.cs
        self.arrays = cs.export_arrays(
            extra_rows=qap.binding_rows(cs.num_public))
        self.pk_meta = (pk.n_vars, pk.n_public, pk.domain)

        nm = self.n_model
        g1 = lambda pts: msm.pack_g1(ec_jax.g1_from_affine_host(pts))
        g2 = lambda pts: msm.pack_g2(ec_jax.g2_from_affine_host(pts))
        # tables padded (with identity points / zero scalars) to multiples
        # of the model axis so every chip holds an equal slice
        self.a_pts = _pad_rows(g1(pk.a_g1 + [pk.delta_g1]), nm,
                               msm._g1_pidentity(()))
        self.b1_pts = _pad_rows(g1(pk.b_g1 + [pk.delta_g1]), nm,
                                msm._g1_pidentity(()))
        self.b2_pts = _pad_rows(g2(pk.b_g2 + [pk.delta_g2]), nm,
                                msm._g2_pidentity(()))
        self.c_pts = _pad_rows(g1(pk.k_g1 + pk.h_g1 + [pk.delta_g1]), nm,
                               msm._g1_pidentity(()))
        self.alpha = g1([pk.alpha_g1])[0]
        self.beta1 = g1([pk.beta_g1])[0]
        self.beta2 = g2([pk.beta_g2])[0]
        self._step = self._build_step()

    def _build_step(self):
        m, npub, n = self.pk_meta
        circuit = self.circuit
        arrays = self.arrays
        mesh = self.mesh
        nm = self.n_model
        sa = self.a_pts.shape[0] // nm
        sb1 = self.b1_pts.shape[0] // nm
        sb2 = self.b2_pts.shape[0] // nm
        sc_ = self.c_pts.shape[0] // nm
        alpha, beta1, beta2 = self.alpha, self.beta1, self.beta2

        def pad_scalars(s: jnp.ndarray, total: int) -> jnp.ndarray:
            return jnp.concatenate(
                [s, jnp.zeros((*s.shape[:-2], total - s.shape[-2], N_LIMBS),
                              jnp.uint32)], axis=-2)

        def step(inputs, r_plain, s_plain, a_pts, b1_pts, b2_pts, c_pts):
            w = circuit.witness(inputs)
            w_plain = limbs.from_mont(w)
            az = sparse.spmv(*arrays["a"], n, w)
            bz = sparse.spmv(*arrays["b"], n, w)
            cz = sparse.spmv(*arrays["c"], n, w)
            a_cos = ntt.coset_evals_from_domain_evals(az)
            b_cos = ntt.coset_evals_from_domain_evals(bz)
            c_cos = ntt.coset_evals_from_domain_evals(cz)
            c_tight = limbs.mont_mul(c_cos, jnp.asarray(FR.one_mont))
            q = limbs.sub(limbs.mont_mul(a_cos, b_cos), c_tight, FR)
            q_plain = limbs.from_mont(q)

            r1 = r_plain[..., None, :]
            s1 = s_plain[..., None, :]
            wa = pad_scalars(jnp.concatenate([w_plain, r1], -2), sa * nm)
            ws = pad_scalars(jnp.concatenate([w_plain, s1], -2), sb1 * nm)
            pi_a = msm.unpack_g1(
                _sharded_msm(wa, a_pts, "g1", sa, "model"))
            pi_a = ec_jax.g1_add(pi_a, _bc1(alpha, pi_a))
            pi_b1 = msm.unpack_g1(
                _sharded_msm(ws, b1_pts, "g1", sb1, "model"))
            pi_b1 = ec_jax.g1_add(pi_b1, _bc1(beta1, pi_b1))
            pi_b = msm.unpack_g2(
                _sharded_msm(ws, b2_pts, "g2", sb2, "model"))
            pi_b = ec_jax.g2_add(pi_b, _bc2(beta2, pi_b))

            rs = limbs.mont_mul(limbs.to_mont(r_plain), s_plain)
            neg_rs = limbs.sub(jnp.zeros_like(rs), rs, FR)
            c_scal = pad_scalars(jnp.concatenate(
                [w_plain[..., npub + 1:, :], q_plain, neg_rs[..., None, :]],
                axis=-2), sc_ * nm)
            pi_c = msm.unpack_g1(
                _sharded_msm(c_scal, c_pts, "g1", sc_, "model"))
            pi_c = ec_jax.g1_add(pi_c, ec_jax.g1_scalar_mul(pi_a, s_plain))
            pi_c = ec_jax.g1_add(pi_c, ec_jax.g1_scalar_mul(pi_b1, r_plain))

            publics = w_plain[..., 1:1 + npub, :]
            return (msm.pack_g1(pi_a), msm.pack_g2(pi_b),
                    msm.pack_g1(pi_c), publics)

        in_specs = (
            jax.tree.map(lambda _: P("data"), {
                k: 0 for k in ["electionId", "nullifier", "availableWeight",
                               "voteHash", "sikRoot", "censusRoot",
                               "address", "password", "signature",
                               "voteWeight", "censusSiblings",
                               "sikSiblings"]}),
            P("data"), P("data"),
            P("model"), P("model"), P("model"), P("model"),
        )
        out_specs = (P("data"), P("data"), P("data"), P("data"))
        fn = shard_map(step, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)
        return jax.jit(fn)

    def prove_batch_arrays(self, inputs: dict, r_arr, s_arr):
        return self._step(inputs, r_arr, s_arr, self.a_pts, self.b1_pts,
                          self.b2_pts, self.c_pts)


def _bc1(packed: jnp.ndarray, like: ec_jax.G1Point) -> ec_jax.G1Point:
    pt = msm.unpack_g1(packed)
    return ec_jax.G1Point(jnp.broadcast_to(pt.x, like.x.shape),
                          jnp.broadcast_to(pt.y, like.y.shape),
                          jnp.broadcast_to(pt.z, like.z.shape))


def _bc2(packed: jnp.ndarray, like: ec_jax.G2Point) -> ec_jax.G2Point:
    pt = msm.unpack_g2(packed)
    return ec_jax.G2Point(jnp.broadcast_to(pt.x, like.x.shape),
                          jnp.broadcast_to(pt.y, like.y.shape),
                          jnp.broadcast_to(pt.z, like.z.shape))

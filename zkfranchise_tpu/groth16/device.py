"""TPU Groth16 prover: the flagship batched proving pipeline.

A batch of voters' circuit inputs goes through four jitted stages:
  1. witness generation (models/census.py),
  2. R1CS row evaluation + coset-NTT quotient (ops/sparse.py, ops/ntt.py),
  3. four MSMs (ops/msm_lm.py — limb-major Pallas Pippenger) with the
     r/s blinding folded into extended scalar/point tables,
  4. proof assembly (two batched scalar-muls + point adds).

Every stage shares ONE data layout (ops/lm.py): field-element vectors are
``(N, 21, B)`` int32 planes — elements on the major axis, limbs on
sublanes, the voter batch B on lanes — so witness wires, NTT domain
points and MSM scalars flow between stages without repacking, and no
stage ever materializes a trailing-dim-1 slice (the round-1 HBM blow-up).

The B1/B2 tables are compacted: wires whose B-polynomial is zero
contribute identity points, which the setup emits as None — dropping
them (3233 of 10148 at nlevels=16) halves the padded MSM size.

This is the work the reference delegates to go-rapidsnark/snarkjs
(/root/reference/zk_census_test.go:89), re-designed as XLA+Pallas
programs over limb planes.  Only the final projective->affine conversion
runs on host.
"""
from __future__ import annotations

import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from ..models.census import CensusCircuit
from ..ops import ec_affine, ec_lm, ff, lm, msm_lm, ntt, sparse
from ..ops.lm import FR, N_LIMBS
from ..ops.pallas import lm_kernels as K
from . import qap
from .setup import ProvingKey
from .verify import Proof

P = ff.P_FR


# ---------------------------------------------------------------------------
# stage functions — shared verbatim by DeviceProver and parallel.ShardedProver
# ---------------------------------------------------------------------------

def witness_stage(circuit: CensusCircuit, inputs: dict):
    """-> (w Montgomery (num_vars, 21, B), w plain canonical)."""
    w = circuit.witness(inputs)
    return w, lm.from_mont(w, FR)


def quotient_stage(arrays: dict, n: int, w: jnp.ndarray) -> jnp.ndarray:
    """R1CS rows -> coset quotient evals, plain canonical (n, 21, B).

    When `arrays` has no C matrix (a zkey-driven prover: snarkjs zkeys
    store only A and B — utils/zkey_compat.arrays_from_zkey), C-row
    evaluations come from the on-domain identity (A.w)∘(B.w) = C.w,
    which holds row-by-row for a satisfying witness (padding rows give
    0∘0 = 0)."""
    az = sparse.spmv(*arrays["a"], n, w)
    bz = sparse.spmv(*arrays["b"], n, w)
    if "c" in arrays:
        cz = sparse.spmv(*arrays["c"], n, w)
    else:
        cz = K.mont_mul(az, bz, FR)
    a_cos = ntt.coset_evals_from_domain_evals(az)
    b_cos = ntt.coset_evals_from_domain_evals(bz)
    c_cos = ntt.coset_evals_from_domain_evals(cz)
    # forward-NTT outputs carry value ~log2(n) * 2^257 (lazy butterfly
    # growth); c must be VALUE-tightened below 2^257 before it can be a
    # spread-subtrahend — one mul by R brings it to < p(1+eps)
    c_tight = K.mont_mul(c_cos, jnp.asarray(FR.one_mont), FR)
    q = lm.sub_n(K.mont_mul(a_cos, b_cos, FR), c_tight, FR)
    return lm.from_mont(q, FR)


def assemble_stage(pa, pb1, pb2, pc_partial, r_plain, s_plain,
                   alpha, beta1, beta2):
    """pa/pb1/pc: (B, 63, 1); pb2: (B, 126, 1); r/s: (21, B) plain;
    alpha/beta1 (63, 1), beta2 (126, 1) point planes."""
    to_lane = lambda x: jnp.swapaxes(x[..., 0], 0, 1)       # -> (rows, B)
    pa, pb1, pc = to_lane(pa), to_lane(pb1), to_lane(pc_partial)
    pb2 = to_lane(pb2)
    pi_a = ec_lm.padd_g1(pa, jnp.broadcast_to(alpha, pa.shape))
    pi_b1 = ec_lm.padd_g1(pb1, jnp.broadcast_to(beta1, pb1.shape))
    pi_b = ec_lm.padd_g2(pb2, jnp.broadcast_to(beta2, pb2.shape))
    s_bits = lm.bits_from_plain(s_plain, 254)               # (254, B)
    r_bits = lm.bits_from_plain(r_plain, 254)
    pi_c = ec_lm.padd_g1(pc, scalar_mul_plane(pi_a, s_bits, "g1"))
    pi_c = ec_lm.padd_g1(pi_c, scalar_mul_plane(pi_b1, r_bits, "g1"))
    return pi_a, pi_b, pi_c


def neg_rs_scalar(r_plain: jnp.ndarray, s_plain: jnp.ndarray) -> jnp.ndarray:
    """-r*s mod p, plain canonical (21, B)."""
    rs = lm.mont_mul(lm.to_mont(r_plain, FR), s_plain, FR)
    return lm.canon(lm.neg_n(rs, FR), FR)


def scalar_mul_plane(p: jnp.ndarray, bits: jnp.ndarray,
                     kind: str) -> jnp.ndarray:
    """p: (rows, B) point plane; bits: (nbits, B) -> (rows, B)."""
    fn = ec_lm.padd_g1 if kind == "g1" else ec_lm.padd_g2
    acc0 = jnp.asarray(K.identity_plane(kind, (), p.shape[-1]))

    def body(i, carry):
        acc, base = carry
        b = bits[i]
        added = fn(acc, base)
        acc = jnp.where((b == 1)[None, :], added, acc)
        return acc, fn(base, base)

    acc, _ = jax.lax.fori_loop(0, bits.shape[0], body, (acc0, p))
    return acc


class DeviceProver:
    """Holds device-resident proving-key tables + the jitted prove stages."""

    def __init__(self, circuit: CensusCircuit, pk: ProvingKey,
                 compile_friendly: bool = False, arrays: dict | None = None):
        """compile_friendly is accepted for API compatibility (the
        limb-major MSM is compile-friendly by construction).

        arrays: optional external sparse R1CS arrays (e.g. from an
        ingested zkey's coefficient section — zkey_compat.arrays_from_
        zkey); defaults to the circuit's own export.  An arrays dict
        without a C matrix routes the quotient through the AB-only
        identity path (see quotient_stage)."""
        self.circuit = circuit
        self.pk_meta = (pk.n_vars, pk.n_public, pk.domain)
        cs = circuit.cs
        self.arrays = arrays if arrays is not None else cs.export_arrays(
            extra_rows=qap.binding_rows(cs.num_public))
        assert self.arrays["num_constraints"] <= pk.domain

        # --- limb-major point tables -------------------------------------
        self.a_tab = jnp.asarray(
            ec_affine.g1_affine_table(pk.a_g1 + [pk.delta_g1]))
        # compacted B tables (B_i zero <=> both G1/G2 entries are None)
        nz = [i for i, pt in enumerate(pk.b_g1) if pt is not None]
        assert all((pk.b_g2[i] is not None) == (pk.b_g1[i] is not None)
                   for i in range(len(pk.b_g1)))
        self.b_nz = np.asarray(nz + [len(pk.b_g1)], dtype=np.int32)
        self.b1_tab = jnp.asarray(ec_affine.g1_affine_table(
            [pk.b_g1[i] for i in nz] + [pk.delta_g1]))
        self.b2_tab = jnp.asarray(ec_affine.g2_affine_table(
            [pk.b_g2[i] for i in nz] + [pk.delta_g2]))
        self.c_tab = jnp.asarray(ec_affine.g1_affine_table(
            pk.k_g1 + pk.h_g1 + [pk.delta_g1]))
        self.alpha = jnp.asarray(ec_lm.g1_table([pk.alpha_g1]).T)   # (63,1)
        self.beta1 = jnp.asarray(ec_lm.g1_table([pk.beta_g1]).T)
        self.beta2 = jnp.asarray(ec_lm.g2_table([pk.beta_g2]).T)    # (126,1)

        self._witness_jit = jax.jit(self._witness_stage)
        # the sparse R1CS arrays are jit ARGUMENTS, not closure
        # constants: baked-in they blow up the serialized program
        # (~75 MB at nlevels=160 — over the remote-compile body limit)
        self._arrays_dev = {
            k: tuple(jnp.asarray(x) for x in self.arrays[k])
            for k in ("a", "b", "c") if k in self.arrays}
        n_dom = self.pk_meta[2]
        self._quotient_raw = jax.jit(
            lambda arrs, w: quotient_stage(arrs, n_dom, w))
        self._quotient_jit = lambda w: self._quotient_raw(
            self._arrays_dev, w)
        # MSMs dispatch per pow2 chunk: one jitted program per
        # (chunk_size, B, kind) SHARED across the A/B1/C MSMs (the r4
        # one-jit-per-MSM layout recompiled the dominant 8192-point
        # program three times — most of its 330 s warm-up)
        self._chunk_jit = jax.jit(msm_lm.chunk_window_sums,
                                  static_argnums=(2,))
        self._combine_jit = jax.jit(msm_lm.combine_horner,
                                    static_argnums=(1, 2))
        self._prog_cache = {}
        self._msm_plans = {}
        for key, tab, kind in (("a", self.a_tab, "g1"),
                               ("b1", self.b1_tab, "g1"),
                               ("b2", self.b2_tab, "g2"),
                               ("c", self.c_tab, "g1")):
            plan = msm_lm._chunks(tab.shape[0])
            tabs = [msm_lm.pad_chunk(jnp.zeros((tab.shape[0], N_LIMBS, 1),
                                               jnp.int32), tab, s, r, m,
                                     kind)[1]
                    for (s, r, m) in plan]
            self._msm_plans[key] = (plan, tabs, kind)
        self._assemble_jit = jax.jit(self._assemble_stage)

    def _msm(self, scalars: jnp.ndarray, key: str) -> jnp.ndarray:
        """Chunk-dispatched MSM over the proving-key table `key`."""
        plan, tabs, kind = self._msm_plans[key]
        B = scalars.shape[-1]
        ws = [self._chunk_call(
            msm_lm.pad_chunk(scalars, None, s, r, m, kind)[0], tab, kind)
            for (s, r, m), tab in zip(plan, tabs)]
        return self._combine_jit(ws, kind, B)

    def _chunk_call(self, sc, tab, kind):
        """chunk_window_sums through the traced-program snapshot cache
        (utils/progcache): the XLA cache only skips backend compile —
        re-TRACING the big chunk programs was most of the ~290 s warm
        start.  TPU only; CPU tests keep the plain jit."""
        if not K.on_tpu():
            return self._chunk_jit(sc, tab, kind)
        ck = (kind, sc.shape, tab.shape)
        fn = self._prog_cache.get(ck)
        if fn is None:
            from ..utils import progcache
            cache_dir = pathlib.Path(os.environ.get(
                "JAX_COMPILATION_CACHE_DIR", ".jax_cache")) / "exports"
            fn = progcache.exported_call(
                f"msm_chunk_{kind}_{sc.shape[0]}x{sc.shape[-1]}",
                self._chunk_jit, (sc, tab, kind), cache_dir)
            self._prog_cache[ck] = fn
        return fn(sc, tab)

    # -- stage 1: witness ----------------------------------------------------
    def _witness_stage(self, inputs: dict):
        return witness_stage(self.circuit, inputs)

    # -- stage 2: az/bz/cz + quotient evals ---------------------------------
    def _quotient_stage(self, w: jnp.ndarray):
        return quotient_stage(self.arrays, self.pk_meta[2], w)

    # -- stage 4: blinding combination (limb-major planes) -------------------
    def _assemble_stage(self, pa, pb1, pb2, pc_partial, r_plain, s_plain):
        return assemble_stage(pa, pb1, pb2, pc_partial, r_plain, s_plain,
                              self.alpha, self.beta1, self.beta2)

    # -- full pipeline -------------------------------------------------------
    def prove_arrays(self, inputs: dict, r_plain: jnp.ndarray,
                     s_plain: jnp.ndarray):
        """Batched prove; r/s: (21, B) plain canonical.  Returns limb-major
        planes (pi_a (63,B), pi_b (126,B), pi_c (63,B), publics)."""
        w, w_plain = self._witness_jit(inputs)
        q_plain = self._quotient_jit(w)
        return self._msm_and_assemble(w_plain, q_plain, r_plain, s_plain)

    def _msm_and_assemble(self, w_plain, q_plain, r_plain, s_plain):
        npub = self.pk_meta[1]
        wa = jnp.concatenate([w_plain, r_plain[None]], axis=0)
        ws = jnp.concatenate([w_plain, s_plain[None]], axis=0)
        ws_b = ws[jnp.asarray(self.b_nz)]
        pa = self._msm(wa, "a")
        pb1 = self._msm(ws_b, "b1")
        pb2 = self._msm(ws_b, "b2")

        neg_rs = neg_rs_scalar(r_plain, s_plain)
        c_scalars = jnp.concatenate(
            [w_plain[npub + 1:], q_plain, neg_rs[None]], axis=0)
        pc = self._msm(c_scalars, "c")

        pi_a, pi_b, pi_c = self._assemble_jit(pa, pb1, pb2, pc,
                                              r_plain, s_plain)
        publics = w_plain[1:1 + npub]
        return pi_a, pi_b, pi_c, publics

    def fused_step(self, inputs: dict, r_plain, s_plain):
        """Whole pipeline as one traceable function (driver compile check)."""
        w, w_plain = self._witness_stage(inputs)
        q_plain = self._quotient_stage(w)
        npub = self.pk_meta[1]
        wa = jnp.concatenate([w_plain, r_plain[None]], axis=0)
        ws = jnp.concatenate([w_plain, s_plain[None]], axis=0)
        ws_b = ws[jnp.asarray(self.b_nz)]
        pa = msm_lm.msm(wa, self.a_tab, "g1")
        pb1 = msm_lm.msm(ws_b, self.b1_tab, "g1")
        pb2 = msm_lm.msm(ws_b, self.b2_tab, "g2")
        neg_rs = neg_rs_scalar(r_plain, s_plain)
        c_scalars = jnp.concatenate(
            [w_plain[npub + 1:], q_plain, neg_rs[None]], axis=0)
        pc = msm_lm.msm(c_scalars, self.c_tab, "g1")
        pi_a, pi_b, pi_c = self._assemble_stage(pa, pb1, pb2, pc,
                                                r_plain, s_plain)
        return pi_a, pi_b, pi_c, w_plain[1:1 + npub]

    # -- host wrapper --------------------------------------------------------
    def prove_batch(self, inputs: dict, seed: int = 0):
        """Returns (proofs: list[Proof], public_signals: list[list[int]])."""
        rng = np.random.default_rng(seed)
        count = int(np.asarray(inputs["address"]).shape[-1])
        r_int = [int.from_bytes(rng.bytes(31), "big") % P for _ in range(count)]
        s_int = [int.from_bytes(rng.bytes(31), "big") % P for _ in range(count)]
        r_arr = jnp.asarray(lm.ints_to_lm(r_int))           # (21, B)
        s_arr = jnp.asarray(lm.ints_to_lm(s_int))
        pa, pb, pc, publics = self.prove_arrays(inputs, r_arr, s_arr)
        return self.finalize(pa, pb, pc, publics)

    def finalize(self, pa, pb, pc, publics):
        """pa/pc: (63, B); pb: (126, B) planes; publics (8, 21, B) plain
        -> snarkjs-format proofs."""
        a_aff = ec_lm.g1_plane_to_affine(pa)
        b_aff = ec_lm.g2_plane_to_affine(pb)
        c_aff = ec_lm.g1_plane_to_affine(pc)
        npub = self.pk_meta[1]
        B = publics.shape[-1]
        flat = lm.lm_to_ints(np.asarray(publics))   # signal-major: i*B + j
        pubs = [[flat[i * B + j] for i in range(npub)] for j in range(B)]
        proofs = []
        for a, b, c in zip(a_aff, b_aff, c_aff):
            proofs.append(Proof({
                "pi_a": [str(a[0]), str(a[1]), "1"],
                "pi_b": [[str(b[0][0]), str(b[0][1])],
                         [str(b[1][0]), str(b[1][1])], ["1", "0"]],
                "pi_c": [str(c[0]), str(c[1]), "1"],
            }))
        return proofs, pubs

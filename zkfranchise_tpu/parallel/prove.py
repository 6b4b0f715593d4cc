"""Sharded Groth16 proving step (shard_map over a (data, model) mesh).

Parallel decomposition (SURVEY.md §2c):
  * voter batch sharded over 'data' — the batch rides the LANE axis of
    every limb plane (ops/lm.py layout), so witness generation, R1CS rows,
    NTT and the quotient evaluations are embarrassingly lane-parallel;
  * R1CS rows + the coset NTT DOMAIN sharded over 'model' — each chip
    evaluates its row range of az/bz/cz (statically partitioned nonzeros)
    and the three coset transforms run as distributed four-step NTTs with
    all_to_all stage exchanges (ops/ntt_dist.py) — n/nm of the butterfly
    work per chip instead of round-3's full replicated transform;
  * MSM point tables sharded over 'model' (major axis) — each chip
    accumulates buckets for its slice of the proving key; partial points
    are combined with an all_gather over ICI followed by a log-depth
    on-chip reduction (EC addition is not a psum-able op: limb planes
    must be combined with the curve group law, so the collective is
    gather+reduce, not psum).

The stage math is IDENTICAL to the single-chip prover — witness_stage /
quotient_stage / msm_lm.msm / assemble_stage are imported from
groth16.device — this module only adds mesh placement.  The same code
drives a real pod slice and the driver's virtual-CPU-device dry run.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.census import CensusCircuit
from ..groth16 import qap
from ..groth16.device import (assemble_stage, neg_rs_scalar, quotient_stage,
                              witness_stage)
from ..ops import ec_affine, ec_lm, lm, msm_lm, ntt_dist
from ..ops.lm import FR, N_LIMBS
from ..ops.pallas import lm_kernels as K


def _shard_rows(arr, n: int, nm: int):
    """Partition one R1CS nonzero list by row range for nm chips.
    arr: (rows, cols, coeffs (nnz, 21, 1)); returns (R, C, F) with
    leading nm axis, nnz padded to the max shard (pad entries have
    coeff 0 -> contribute nothing), rows RELATIVE to the chip base."""
    rows, cols, coeffs = arr
    b = n // nm
    per = [[] for _ in range(nm)]
    for k in range(len(rows)):
        per[int(rows[k]) // b].append(k)
    nnz = max((len(p) for p in per), default=1) or 1
    R = np.zeros((nm, nnz), np.int32)
    C = np.zeros((nm, nnz), np.int32)
    F = np.zeros((nm, nnz, N_LIMBS, 1), np.int32)
    for i, idxs in enumerate(per):
        for j, k in enumerate(idxs):
            R[i, j] = int(rows[k]) - i * b
            C[i, j] = int(cols[k])
            F[i, j] = coeffs[k]
    return R, C, F


def _spmv_local(R, C, F, b: int, w: jnp.ndarray) -> jnp.ndarray:
    """This chip's rows of the R1CS matvec: (b, 21, T) Montgomery."""
    gathered = w[C]                                  # (nnz, 21, T)
    prods = K.mont_mul(F, gathered, FR)              # Pallas kernel on TPU
    seg = jax.ops.segment_sum(prods, R, num_segments=b)
    return lm.weak_norm(seg, 2)


def _pad_table(tab: np.ndarray, mult: int, kind: str) -> np.ndarray:
    """Pad an (n, arows) AFFINE table with identity rows to a multiple."""
    n = tab.shape[0]
    m = ((n + mult - 1) // mult) * mult
    if m == n:
        return tab
    return np.concatenate(
        [np.asarray(tab), ec_affine.identity_rows(kind, m - n)], axis=0)


def _tree_reduce_axis0(pts: jnp.ndarray, kind: str) -> jnp.ndarray:
    """(S, B, rows, 1) gathered partials -> (B, rows, 1) group sum."""
    fn = ec_lm.padd_g1 if kind == "g1" else ec_lm.padd_g2
    while pts.shape[0] > 1:
        if pts.shape[0] % 2:
            pad = jnp.asarray(
                K.identity_plane(kind, (1, *pts.shape[1:-2]), 1))
            pts = jnp.concatenate([pts, pad], axis=0)
        pts = fn(pts[0::2], pts[1::2])
    return pts[0]


def _sharded_msm(scalars_full: jnp.ndarray, tab_shard: jnp.ndarray,
                 kind: str, shard_size: int, axis: str) -> jnp.ndarray:
    """scalars_full: (n_padded, 21, B) replicated on `axis`;
    tab_shard: (n_padded/axis_size, rows) this chip's table slice.
    Returns the full MSM result, identical on every member of `axis`."""
    idx = jax.lax.axis_index(axis)
    sc = jax.lax.dynamic_slice_in_dim(
        scalars_full, idx * shard_size, shard_size, axis=0)
    partial = msm_lm.msm(sc, tab_shard, kind)           # (B, rows, 1)
    gathered = jax.lax.all_gather(partial, axis)        # (S, B, rows, 1)
    return _tree_reduce_axis0(gathered, kind)


# input-dict sharding: every leaf's LAST axis is the voter batch
_IN_KEYS = ("electionId", "nullifier", "availableWeight", "voteHash",
            "sikRoot", "censusRoot", "address", "password", "signature",
            "voteWeight", "censusSiblings", "sikSiblings")
_IN_RANKS = {"electionId": 3, "voteHash": 3, "censusSiblings": 3,
             "sikSiblings": 3}


def _in_spec(key):
    rank = _IN_RANKS.get(key, 2)
    return P(*([None] * (rank - 1) + ["data"]))


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

        # domain sharding for the quotient stage (four-step NTT needs
        # nm^2 | n; nm=1 falls back to the replicated local transform)
        n = pk.domain
        nm = self.n_model
        self._dist_ntt = nm > 1 and n % (nm * nm) == 0
        if self._dist_ntt:
            self._ntt_plan = ntt_dist.DistNTTPlan(n.bit_length() - 1, nm)
            self._row_shards = tuple(
                jnp.asarray(a) for k in ("a", "b", "c")
                for a in _shard_rows(self.arrays[k], n, nm))

        nm = self.n_model
        self.a_tab = jnp.asarray(_pad_table(
            ec_affine.g1_affine_table(pk.a_g1 + [pk.delta_g1]), nm, "g1"))
        nz = [i for i, pt in enumerate(pk.b_g1) if pt is not None]
        self.b_nz = np.asarray(nz + [len(pk.b_g1)], dtype=np.int32)
        self.b1_tab = jnp.asarray(_pad_table(
            ec_affine.g1_affine_table([pk.b_g1[i] for i in nz]
                                      + [pk.delta_g1]), nm, "g1"))
        self.b2_tab = jnp.asarray(_pad_table(
            ec_affine.g2_affine_table([pk.b_g2[i] for i in nz]
                                      + [pk.delta_g2]), nm, "g2"))
        self.c_tab = jnp.asarray(_pad_table(
            ec_affine.g1_affine_table(pk.k_g1 + pk.h_g1 + [pk.delta_g1]),
            nm, "g1"))
        self.alpha = jnp.asarray(ec_lm.g1_table([pk.alpha_g1]).T)
        self.beta1 = jnp.asarray(ec_lm.g1_table([pk.beta_g1]).T)
        self.beta2 = jnp.asarray(ec_lm.g2_table([pk.beta_g2]).T)
        self._build_stages()

    def _build_stages(self):
        circuit = self.circuit
        arrays = self.arrays
        n = self.pk_meta[2]
        mesh = self.mesh
        nm = self.n_model
        alpha, beta1, beta2 = self.alpha, self.beta1, self.beta2

        def dmap(fn, in_specs, out_specs):
            return jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                                     out_specs=out_specs, check_rep=False))

        lane = P(None, None, "data")
        inspec_inputs = {k: _in_spec(k) for k in _IN_KEYS}

        self._witness = dmap(lambda inputs: witness_stage(circuit, inputs),
                             (inspec_inputs,), (lane, lane))
        if self._dist_ntt:
            plan = self._ntt_plan
            b = n // nm

            def quotient_sharded(w, Ra, Ca, Fa, Rb, Cb, Fb, Rc, Cc, Fc):
                """Rows + NTT domain sharded over 'model'; shard args
                arrive with a leading local axis of size 1."""
                az = _spmv_local(Ra[0], Ca[0], Fa[0], b, w)
                bz = _spmv_local(Rb[0], Cb[0], Fb[0], b, w)
                cz = _spmv_local(Rc[0], Cc[0], Fc[0], b, w)
                a_cos = ntt_dist.coset_evals_dist(az, "model", plan)
                b_cos = ntt_dist.coset_evals_dist(bz, "model", plan)
                c_cos = ntt_dist.coset_evals_dist(cz, "model", plan)
                # see groth16.device.quotient_stage: tighten c below 2^257
                c_tight = lm.mont_mul(c_cos, jnp.asarray(FR.one_mont), FR)
                q = lm.sub_n(lm.mont_mul(a_cos, b_cos, FR), c_tight, FR)
                return lm.from_mont(q, FR)

            rspec = P("model", None)
            fspec = P("model", None, None, None)
            qfn = dmap(quotient_sharded,
                       (lane,) + (rspec, rspec, fspec) * 3,
                       P("model", None, "data"))
            shards = self._row_shards
            self._quotient = lambda w: qfn(w, *shards)
        else:
            self._quotient = dmap(lambda w: quotient_stage(arrays, n, w),
                                  (lane,), lane)

        def make_msm(kind):
            def stage(scalars, tab):
                return _sharded_msm(scalars, tab, kind,
                                    scalars.shape[0] // nm, "model")
            return dmap(stage, (lane, P("model", None)), P("data"))

        self._msm_g1 = make_msm("g1")
        self._msm_g2 = make_msm("g2")

        def assemble(pa, pb1, pb, pc_partial, r_plain, s_plain):
            return assemble_stage(pa, pb1, pb, pc_partial, r_plain, s_plain,
                                  alpha, beta1, beta2)

        rsspec = P(None, "data")
        self._assemble = dmap(
            assemble,
            (P("data"), P("data"), P("data"), P("data"), rsspec, rsspec),
            (P(None, "data"), P(None, "data"), P(None, "data")))

    def _build_fused(self):
        """One jitted shard_map for the WHOLE proving step (witness ->
        quotient -> MSMs -> assemble).  The per-stage jits above keep the
        stage glue (concat / b_nz gather / padding) in eager host code,
        which is fine single-process but illegal across processes (eager
        ops on non-fully-addressable global arrays).  Multi-process
        proving and the driver dryrun use this fused program instead."""
        circuit = self.circuit
        arrays = self.arrays
        n = self.pk_meta[2]
        npub = self.pk_meta[1]
        nm = self.n_model
        mesh = self.mesh
        alpha, beta1, beta2 = self.alpha, self.beta1, self.beta2
        b_nz = jnp.asarray(self.b_nz)
        na, nb, nc = (self.a_tab.shape[0], self.b1_tab.shape[0],
                      self.c_tab.shape[0])
        dist_ntt = self._dist_ntt
        if dist_ntt:
            plan = self._ntt_plan
            brows = n // nm

        def pad0(s, total):
            return jnp.concatenate(
                [s, jnp.zeros((total - s.shape[0], N_LIMBS, s.shape[-1]),
                              jnp.int32)], axis=0)

        def fused(inputs, r_plain, s_plain, a_tab, b1_tab, b2_tab, c_tab,
                  *row_shards):
            w, w_plain = witness_stage(circuit, inputs)
            if dist_ntt:
                (Ra, Ca, Fa, Rb, Cb, Fb, Rc, Cc, Fc) = row_shards
                az = _spmv_local(Ra[0], Ca[0], Fa[0], brows, w)
                bz = _spmv_local(Rb[0], Cb[0], Fb[0], brows, w)
                cz = _spmv_local(Rc[0], Cc[0], Fc[0], brows, w)
                a_cos = ntt_dist.coset_evals_dist(az, "model", plan)
                b_cos = ntt_dist.coset_evals_dist(bz, "model", plan)
                c_cos = ntt_dist.coset_evals_dist(cz, "model", plan)
                c_tight = lm.mont_mul(c_cos, jnp.asarray(FR.one_mont), FR)
                q_local = lm.sub_n(lm.mont_mul(a_cos, b_cos, FR),
                                   c_tight, FR)
                q_plain = jax.lax.all_gather(
                    lm.from_mont(q_local, FR), "model", axis=0,
                    tiled=True)                       # (n, 21, T)
            else:
                q_plain = quotient_stage(arrays, n, w)
            wa = pad0(jnp.concatenate([w_plain, r_plain[None]], axis=0), na)
            ws = jnp.concatenate([w_plain, s_plain[None]], axis=0)
            ws_b = pad0(ws[b_nz], nb)
            pa = _sharded_msm(wa, a_tab, "g1", na // nm, "model")
            pb1 = _sharded_msm(ws_b, b1_tab, "g1", nb // nm, "model")
            pb = _sharded_msm(ws_b, b2_tab, "g2", nb // nm, "model")
            neg_rs = neg_rs_scalar(r_plain, s_plain)
            c_scal = pad0(jnp.concatenate(
                [w_plain[npub + 1:], q_plain, neg_rs[None]], axis=0), nc)
            pc = _sharded_msm(c_scal, c_tab, "g1", nc // nm, "model")
            pa_f, pb_f, pc_f = assemble_stage(
                pa, pb1, pb, pc, r_plain, s_plain, alpha, beta1, beta2)
            return pa_f, pb_f, pc_f, w_plain[1:1 + npub]

        lane = P(None, None, "data")
        rsspec = P(None, "data")
        tabspec = P("model", None)
        in_specs = [{k: _in_spec(k) for k in _IN_KEYS}, rsspec, rsspec,
                    tabspec, tabspec, tabspec, tabspec]
        if dist_ntt:
            in_specs += [P("model", None), P("model", None),
                         P("model", None, None, None)] * 3
        out_specs = (P(None, "data"), P(None, "data"), P(None, "data"),
                     P(None, None, "data"))
        return jax.jit(shard_map(fused, mesh=mesh,
                                 in_specs=tuple(in_specs),
                                 out_specs=out_specs, check_rep=False))

    def prove_fused(self, inputs: dict, r_arr, s_arr,
                    compile_only: bool = False):
        """Whole-step fused prove (multi-process safe: no eager glue).
        Same returns as prove_batch_arrays.  In multi-controller runs the
        internally-built key tables are resharded into global arrays (each
        process holds an identical host copy; make_global uploads only the
        addressable shards).

        compile_only: AOT-compile without executing.  Multi-process
        callers compile first, meet at a coordination barrier, then
        execute — otherwise compile-time skew between processes can
        exceed the CPU collective backend's 30 s connect timeout."""
        if not hasattr(self, "_fused"):
            self._fused = self._build_fused()
            tabs = (self.a_tab, self.b1_tab, self.b2_tab, self.c_tab)
            extra = self._row_shards if self._dist_ntt else ()
            if jax.process_count() > 1:
                from . import runtime
                tabs = tuple(runtime.make_global(
                    np.asarray(t), self.mesh, P("model", None))
                    for t in tabs)
                specs = [P("model", None), P("model", None),
                         P("model", None, None, None)] * 3
                extra = tuple(runtime.make_global(
                    np.asarray(a), self.mesh, sp)
                    for a, sp in zip(extra, specs))
            self._fused_consts = tabs + extra
        if compile_only:
            # keep the executable: a later jit call does NOT reuse an
            # AOT .lower().compile() result and would recompile
            self._fused_compiled = self._fused.lower(
                inputs, r_arr, s_arr, *self._fused_consts).compile()
            return None
        if getattr(self, "_fused_compiled", None) is not None:
            return self._fused_compiled(inputs, r_arr, s_arr,
                                        *self._fused_consts)
        return self._fused(inputs, r_arr, s_arr, *self._fused_consts)

    def prove_batch_arrays(self, inputs: dict, r_arr, s_arr):
        """inputs: batch_to_arrays dict; r/s: (21, B) plain canonical.
        Returns limb-major planes (pi_a (63,B), pi_b (126,B), pi_c (63,B),
        publics (8, 21, B) plain)."""
        npub = self.pk_meta[1]

        def pad_scalars(s, total):
            return jnp.concatenate(
                [s, jnp.zeros((total - s.shape[0], lm.N_LIMBS, s.shape[-1]),
                              jnp.int32)], axis=0)

        w, w_plain = self._witness(inputs)
        q_plain = self._quotient(w)
        wa = pad_scalars(jnp.concatenate([w_plain, r_arr[None]], axis=0),
                         self.a_tab.shape[0])
        ws = jnp.concatenate([w_plain, s_arr[None]], axis=0)
        ws_b = pad_scalars(ws[jnp.asarray(self.b_nz)], self.b1_tab.shape[0])
        pa = self._msm_g1(wa, self.a_tab)
        pb1 = self._msm_g1(ws_b, self.b1_tab)
        pb = self._msm_g2(ws_b, self.b2_tab)
        neg_rs = neg_rs_scalar(r_arr, s_arr)
        c_scal = pad_scalars(jnp.concatenate(
            [w_plain[npub + 1:], q_plain, neg_rs[None]], axis=0),
            self.c_tab.shape[0])
        pc_partial = self._msm_g1(c_scal, self.c_tab)
        pa_f, pb_f, pc_f = self._assemble(pa, pb1, pb, pc_partial,
                                          r_arr, s_arr)
        publics = w_plain[1:1 + npub]
        return pa_f, pb_f, pc_f, publics

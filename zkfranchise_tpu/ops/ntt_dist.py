"""Domain-sharded (distributed) NTT: four-step decomposition over a mesh
axis with all_to_all stage exchanges.

Shards the TRANSFORM DOMAIN (the major row axis of ``(n, 21, T)`` planes)
across `nm` chips of a mesh axis — the "sequence parallelism" analog of
this workload (SURVEY.md §5 long-context row: the scaling dimension is the
FFT domain size).  Each chip performs n/nm of the butterfly work; the
cross-chip butterfly stages are factored into ONE small dense transform of
size nm plus two all_to_all transposes per transform (the classic
four-step/Bailey algorithm mapped onto ICI collectives):

  inverse, contiguous-in -> strided-out  (w = omega^{-1}, n = nm*b):
    X[k2*nm + k1] = sum_{j2} w^{j2 k1} Y[k1][j2] * wb^{j2 k2},
    Y[k1][j2]     = (1/nm) sum_{j1} wm^{j1 k1} x[j1*b + j2]
  forward, strided-in -> contiguous-out (w = omega):
    X[k1*b + k2]  = sum_{j1} wm^{j1 k1} (w^{j1 k2} Z[j1][k2]),
    Z[j1][k2]     = NTT_b over j2 of z[j2*nm + j1]

  (wm = w^b has order nm; wb = w^nm has order b; "strided" layout: chip c
  holds rows {k : k = q*nm + c}, ordered by q.)

The inner nm-point transform is a dense wm^{j1 k1} combine (nm <= 8 on a
host; nm^2 Montgomery muls over b/nm rows), done AFTER an all_to_all that
transposes which factor of the index is sharded.  Replaces the replicated
per-chip NTT of parallel/prove.py round 3 — the hot loop #2 of the
reference's delegated prover (/root/reference/zk_census_test.go:89).

All functions here run INSIDE shard_map (they call jax.lax.all_to_all /
axis_index on the given axis name).  Correctness oracle: ops/ntt.py on the
gathered array (tests/test_ntt_dist.py, 8-device CPU mesh).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..groth16 import poly
from . import ff, lm, ntt
from .lm import FR
from .pallas import lm_kernels as K

P = ff.P_FR


def _mont_cols(vals) -> np.ndarray:
    """list of ints -> (len, 21, 1) int32 Montgomery-form limb planes."""
    r = FR.r_mod_p
    return np.asarray(lm.ints_to_lm([v * r % P for v in vals]),
                      np.int32).T[:, :, None]


@functools.lru_cache(maxsize=None)
class DistNTTPlan:
    """Host-precomputed tables for an n = nm * b transform sharded nm ways.

    Tables indexed by chip are shipped as full arrays and dynamic-sliced
    by axis_index inside shard_map (they are small: O(n) field elements).
    """

    def __init__(self, log_n: int, nm: int):
        n = 1 << log_n
        assert n % nm == 0 and nm & (nm - 1) == 0
        b = n // nm
        assert b % nm == 0, "four-step needs nm^2 <= n"
        self.n, self.nm, self.b = n, nm, b
        self.log_b = b.bit_length() - 1
        w = poly.root_of_unity(log_n)
        wi = ff.inv_mod(w, P)
        nm_inv = ff.inv_mod(nm, P)

        # inner dense transforms: wm^{j1*k1} (order-nm root)
        wm_f = pow(w, b, P)
        wm_i = pow(wi, b, P)
        self.m_fwd = _mont_cols(
            [pow(wm_f, j1 * k1, P) for k1 in range(nm) for j1 in range(nm)]
        ).reshape(nm, nm, lm.N_LIMBS, 1)
        # inverse combine folds the 1/nm scale in
        self.m_inv = _mont_cols(
            [pow(wm_i, j1 * k1, P) * nm_inv % P
             for k1 in range(nm) for j1 in range(nm)]
        ).reshape(nm, nm, lm.N_LIMBS, 1)

        # inverse step twiddle, chip j2a: [k1, j2b] -> wi^{j2*k1},
        # j2 = j2a*(b/nm) + j2b
        c = b // nm
        self.tw_inv = _mont_cols(
            [pow(wi, (j2a * c + j2b) * k1, P)
             for j2a in range(nm) for k1 in range(nm) for j2b in range(c)]
        ).reshape(nm, nm, c, lm.N_LIMBS, 1)

        # forward step twiddle, chip j1: [k2] -> w^{j1*k2}
        self.tw_fwd = _mont_cols(
            [pow(w, j1 * k2, P) for j1 in range(nm) for k2 in range(b)]
        ).reshape(nm, b, lm.N_LIMBS, 1)

        # coset shift tables in STRIDED layout, chip c0: [q] -> s^{q*nm+c0}
        s = poly.COSET_SHIFT
        sinv = ff.inv_mod(s, P)
        self.shift_strided = _mont_cols(
            [pow(s, q * nm + c0, P)
             for c0 in range(nm) for q in range(b)]
        ).reshape(nm, b, lm.N_LIMBS, 1)
        self.shift_inv_strided = _mont_cols(
            [pow(sinv, q * nm + c0, P)
             for c0 in range(nm) for q in range(b)]
        ).reshape(nm, b, lm.N_LIMBS, 1)

        self.local_plan = ntt.NTTPlan(self.log_b)


def _chip_slice(table: np.ndarray, axis_name: str) -> jnp.ndarray:
    """table (nm, ...) -> this chip's (...) slice via axis_index."""
    i = jax.lax.axis_index(axis_name)
    t = jnp.asarray(table)
    return jax.lax.dynamic_index_in_dim(t, i, axis=0, keepdims=False)


def _combine(m_tab: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Dense nm-point transform over the leading axis.
    m_tab: (nm, nm, 21, 1); x: (nm, rows, 21, T) -> (nm, rows, 21, T)."""
    nm = x.shape[0]
    outs = []
    for k1 in range(nm):
        acc = None
        for j1 in range(nm):
            term = K.mont_mul(m_tab[k1, j1], x[j1], FR)
            acc = term if acc is None else acc + term
        outs.append(lm.weak_norm(acc, 2))
    return jnp.stack(outs, axis=0)


def intt_dist(x_local: jnp.ndarray, axis: str, plan: DistNTTPlan
              ) -> jnp.ndarray:
    """Inverse NTT, contiguous-sharded input -> strided-sharded output.
    x_local: (b, 21, T) Montgomery (chip c holds rows [c*b, (c+1)*b));
    returns (b, 21, T): chip c holds coefficients {q*nm + c}."""
    nm, b = plan.nm, plan.b
    c = b // nm
    T = x_local.shape[-1]
    # split j2 -> (j2a, j2b); transpose shard: chip j2a gets all j1
    xs = x_local.reshape(nm, c, lm.N_LIMBS, T)
    xt = jax.lax.all_to_all(xs, axis, split_axis=0, concat_axis=0)
    y = _combine(jnp.asarray(plan.m_inv), xt)       # [k1, j2b]
    tw = _chip_slice(plan.tw_inv, axis)             # (nm, c, 21, 1)
    y = K.mont_mul(y, tw, FR)
    # transpose back: chip k1 gets all (j2a, j2b) = all j2
    z = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=0)
    z = z.reshape(b, lm.N_LIMBS, T)                 # natural j2 order
    # local length-b inverse transform (includes its own 1/b scale)
    lp = plan.local_plan
    out = ntt._transform(z, lp.inv_g, lp.inv_tw, lp.inv_final)
    return K.mont_mul(out, jnp.asarray(lp.n_inv_mont), FR)


def ntt_dist(z_local: jnp.ndarray, axis: str, plan: DistNTTPlan
             ) -> jnp.ndarray:
    """Forward NTT, strided-sharded input -> contiguous-sharded output.
    z_local: (b, 21, T): chip c holds rows {q*nm + c} (q-ordered);
    returns (b, 21, T): chip c holds evals [c*b, (c+1)*b)."""
    nm, b = plan.nm, plan.b
    c = b // nm
    T = z_local.shape[-1]
    lp = plan.local_plan
    zt = ntt._transform(z_local, lp.fwd_g, lp.fwd_tw, lp.fwd_final)
    tw = _chip_slice(plan.tw_fwd, axis)             # (b, 21, 1)
    zt = K.mont_mul(zt, tw, FR)
    # split k2 -> (k2a, k2b); transpose: chip k2a gets all j1
    zs = zt.reshape(nm, c, lm.N_LIMBS, T)
    xt = jax.lax.all_to_all(zs, axis, split_axis=0, concat_axis=0)
    y = _combine(jnp.asarray(plan.m_fwd), xt)       # [k1, k2b]
    # transpose: chip k1 gets all (k2a, k2b) = all k2
    out = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=0)
    return out.reshape(b, lm.N_LIMBS, T)


def coset_evals_dist(x_local: jnp.ndarray, axis: str, plan: DistNTTPlan
                     ) -> jnp.ndarray:
    """Sharded equivalent of ntt.coset_evals_from_domain_evals:
    contiguous-sharded domain evals -> contiguous-sharded coset evals.
    Two distributed transforms + one strided shift-multiply."""
    coefs = intt_dist(x_local, axis, plan)          # strided coefficients
    sh = _chip_slice(plan.shift_strided, axis)      # (b, 21, 1)
    return ntt_dist(K.mont_mul(coefs, sh, FR), axis, plan)


def unstride(gathered: jnp.ndarray, nm: int) -> jnp.ndarray:
    """(nm, b, ...) all_gather of a STRIDED sharding -> (n, ...) natural
    order (row q*nm + c comes from shard c position q)."""
    return jnp.swapaxes(gathered, 0, 1).reshape(
        gathered.shape[0] * gathered.shape[1], *gathered.shape[2:])

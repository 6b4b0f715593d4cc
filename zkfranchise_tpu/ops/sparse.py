"""Batched sparse matrix-vector products over Fr for R1CS evaluation.

Element-major limb layout (ops/lm.py): the witness is ``(m, 21, T)`` with
wires on the major axis and the voter batch T on lanes.  az/bz/cz for the
whole batch are one row gather over static column indices, one Montgomery
product per nonzero (full lane width), and a leading-axis segment-sum —
exact in int32, since row fan-in is < 2^9 and normalized limbs < 2^13+2,
so per-limb sums stay < 2^22.  Two weak-normalize rounds land the rows
back at mul-safe limbs; no extra Montgomery reduction is needed.

This replaces the per-proof coefficient loop inside go-rapidsnark's prover
(SURVEY.md §3.3 "coefficient mult-add").  Coefficients arrive in R-form
(c*R mod p) from models.r1cs.ConstraintSystem.export_arrays, so the single
mont_mul per nonzero — mont_mul(cR, wR) = c*w*R — lands c*w directly in
Montgomery form.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import lm
from .lm import FR
from .pallas import lm_kernels as K


MAX_NNZ_CHUNK = 1 << 17


def spmv(rows: np.ndarray, cols: np.ndarray, coeffs_mont: np.ndarray,
         n_rows: int, w_mont: jnp.ndarray) -> jnp.ndarray:
    """rows/cols: (nnz,) int32; coeffs_mont: (nnz, 21, 1) int32 R-form
    coefficients; w_mont: (m, 21, T) Montgomery witness.
    Returns (n_rows, 21, T) Montgomery row values (rows beyond the last
    index are zero).

    Large systems stream the nonzeros in 2^17-entry chunks under a scan:
    one materialized (nnz, 21, T) gather at nlevels=160 is ~15 GB
    (nnz = 1.42M) and OOMs the chip.  Chunk padding uses zero
    coefficients (contribute nothing to row 0); the accumulator is
    re-weak-normalized per chunk, so limb growth stays bounded and the
    VALUE bound (row fan-in * p) is unchanged from the unchunked form."""
    nnz = int(rows.shape[0])
    if nnz <= 2 * MAX_NNZ_CHUNK:
        gathered = w_mont[jnp.asarray(cols)]           # (nnz, 21, T)
        prods = K.mont_mul(jnp.asarray(coeffs_mont), gathered, FR)
        seg = jax.ops.segment_sum(prods, jnp.asarray(rows),
                                  num_segments=n_rows)
        return lm.weak_norm(seg, 2)

    c = MAX_NNZ_CHUNK
    k = (nnz + c - 1) // c
    pad = k * c - nnz
    R = jnp.pad(jnp.asarray(rows), (0, pad)).reshape(k, c)
    C = jnp.pad(jnp.asarray(cols), (0, pad)).reshape(k, c)
    F = jnp.pad(jnp.asarray(coeffs_mont),
                ((0, pad), (0, 0), (0, 0))).reshape(k, c, lm.N_LIMBS, 1)
    T = w_mont.shape[-1]
    acc0 = jnp.zeros((n_rows, lm.N_LIMBS, T), jnp.int32)

    def body(acc, rcf):
        r, cl, f = rcf
        prods = K.mont_mul(f, w_mont[cl], FR)
        seg = jax.ops.segment_sum(prods, r, num_segments=n_rows)
        return lm.weak_norm(acc + seg, 2), None

    acc, _ = jax.lax.scan(body, acc0, (R, C, F))
    return acc

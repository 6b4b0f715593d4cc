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


def spmv(rows: np.ndarray, cols: np.ndarray, coeffs_mont: np.ndarray,
         n_rows: int, w_mont: jnp.ndarray) -> jnp.ndarray:
    """rows/cols: (nnz,) int32 static; coeffs_mont: (nnz, 21, 1) int32
    static R-form coefficients; w_mont: (m, 21, T) Montgomery witness.
    Returns (n_rows, 21, T) Montgomery row values (rows beyond the last
    index are zero)."""
    gathered = w_mont[jnp.asarray(cols)]               # (nnz, 21, T)
    prods = K.mont_mul(jnp.asarray(coeffs_mont), gathered, FR)
    seg = jax.ops.segment_sum(prods, jnp.asarray(rows),
                              num_segments=n_rows)     # (n_rows, 21, T)
    return lm.weak_norm(seg, 2)

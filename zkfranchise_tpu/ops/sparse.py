"""Batched sparse matrix-vector products over Fr for R1CS evaluation.

Computes az/bz/cz = <rows, witness> for the whole voter batch in one shot:
a gather over static column indices, one Montgomery product per nonzero,
a limb-wise segment sum (exact in uint32: row fan-in is < 2^8, limbs < 2^16,
so sums stay < 2^24), and one wide Montgomery reduction per row.

This replaces the per-proof coefficient loop inside go-rapidsnark's prover
(SURVEY.md §3.3 "coefficient mult-add").  Coefficients arrive in R^2-form
from models.r1cs.ConstraintSystem.export_arrays, making the row values come
out of the single reduction already in Montgomery form.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs
from .limbs import FR, N_LIMBS, WIDE


def spmv(rows: np.ndarray, cols: np.ndarray, coeffs_r2: np.ndarray,
         n_rows: int, w_mont: jnp.ndarray) -> jnp.ndarray:
    """rows/cols: (nnz,) int32 static; coeffs_r2: (nnz, 16) uint32 static;
    w_mont: (..., m, 16) Montgomery witness.  Returns (..., n_rows, 16)
    Montgomery row values (rows beyond the last index are zero)."""
    gathered = w_mont[..., cols, :]                    # (..., nnz, 16)
    prods = limbs.mont_mul(jnp.asarray(coeffs_r2), gathered)
    # segment sum over nnz (leading-axis requirement -> move axis)
    lead = jnp.moveaxis(prods, -2, 0)                  # (nnz, ..., 16)
    seg = jax.ops.segment_sum(lead, jnp.asarray(rows), num_segments=n_rows)
    seg = jnp.moveaxis(seg, 0, -2)                     # (..., n_rows, 16)
    wide = jnp.concatenate(
        [seg, jnp.zeros((*seg.shape[:-1], WIDE - N_LIMBS), jnp.uint32)],
        axis=-1)
    return limbs.mont_reduce_wide(wide, FR)

"""Golden tests for the limb-major MSM (ops/msm_lm.py) vs the host oracle.

Scalars enter in the production layout: (n, 21, B) int32 limb-major plain
canonical planes (points on the major axis, limbs on sublanes, the proof
batch B on lanes) — the same shape the witness pipeline emits.
"""
import functools

import jax
import numpy as np
import jax.numpy as jnp

from zkfranchise_tpu.ops import ec, ec_affine, ec_lm, ff, lm, msm_lm


@functools.partial(jax.jit, static_argnums=(2,))
def _msm_jit(sc, table, kind):
    return msm_lm.msm(sc, table, kind)

RNG = np.random.default_rng(3)


def _scalars(b, n, small=False):
    hi = 1 << (16 if small else 254)
    return [[int.from_bytes(RNG.bytes(32), "big") % min(hi, ff.P_FR)
             for _ in range(n)] for _ in range(b)]


def _to_lm(scal):
    """scal[b][i] -> (n, 21, B) limb-major plain planes."""
    b, n = len(scal), len(scal[0])
    return jnp.asarray(np.stack(
        [lm.ints_to_lm([scal[j][i] for j in range(b)]) for i in range(n)]))


def _run(b, n, kind, scal=None, pts=None):
    scal = scal if scal is not None else _scalars(b, n)
    if pts is None:
        if kind == "g1":
            pts = [ec.g1_mul(j + 3) for j in range(n)]
        else:
            pts = [ec.g2_mul(j + 3) for j in range(n)]
    table = jnp.asarray(ec_affine.affine_table(pts, kind))
    out = _msm_jit(_to_lm(scal), table, kind)       # (B, rows, 1)
    plane = jnp.swapaxes(out[..., 0], 0, 1)         # (rows, B)
    if kind == "g1":
        got = ec_lm.g1_plane_to_affine(plane)
    else:
        got = ec_lm.g2_plane_to_affine(plane)
    grp = ec.G1 if kind == "g1" else ec.G2
    want = [ec.msm_host(row, pts, grp) for row in scal]
    assert got == want


def test_msm_g1_small():
    _run(2, 5, "g1")


def test_msm_g1_pow2():
    _run(1, 8, "g1")


def test_msm_g1_zero_and_dup_scalars():
    scal = [[0, 1, 2, 2, 0, ff.P_FR - 1, 12345, 1 << 200]]
    _run(1, 8, "g1", scal=scal)


def test_msm_g1_identity_points():
    pts = [ec.g1_mul(5), None, ec.g1_mul(9)]
    _run(1, 3, "g1", pts=pts)


def test_msm_g2_small():
    _run(1, 5, "g2")


def test_msm_pow2_chunking(monkeypatch):
    """Force multi-chunk decomposition (prod: n=10150 -> 8192+2048) at
    test scale and check the combined result + the chunk plan."""
    monkeypatch.setattr(msm_lm, "MIN_CHUNK", 4)
    assert msm_lm._chunks(9) == [(0, 8, 8), (8, 1, 1)]
    assert msm_lm._chunks(8) == [(0, 8, 8)]
    assert msm_lm._chunks(3) == [(0, 3, 4)]
    assert msm_lm._chunks(13) == [(0, 13, 16)]   # waste < threshold
    scal = [[0, 1, 2, ff.P_FR - 1, 7, 1 << 130, 5, 6, 12]]
    pts = [ec.g1_mul(j + 3) for j in range(8)] + [None]
    table = jnp.asarray(ec_affine.affine_table(pts, "g1"))
    out = msm_lm.msm(_to_lm(scal), table, "g1")
    plane = jnp.swapaxes(out[..., 0], 0, 1)
    want = [ec.msm_host(scal[0], pts, ec.G1)]
    assert ec_lm.g1_plane_to_affine(plane) == want


def test_msm_g1_coarse_path_m128():
    """m == 128: the coarse prefix-scan path with NO fine levels."""
    _run(2, 128, "g1")


def test_msm_g1_coarse_path_m256():
    """m = 256: coarse prefix + 1-level fine walk + affine L0 nodes."""
    _run(1, 256, "g1")


def test_msm_g1_coarse_path_unpadded():
    """n = 160 -> m = 256 with identity padding through the new path."""
    _run(1, 160, "g1")


def test_msm_g2_coarse_path():
    _run(1, 130, "g2")

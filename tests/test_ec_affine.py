"""Batch-affine fold (ops/ec_affine.py) vs the host oracle, including
every exceptional case: add, double, P + (-P), infinity operands."""
import jax
import jax.numpy as jnp
import numpy as np

from zkfranchise_tpu.ops import ec, ec_affine, ec_lm, ff, lm


def _aff_to_host(plane, kind):
    """(arows, T) affine plane -> list of host points/None."""
    k = 1 if kind == "g1" else 2
    NL = lm.N_LIMBS
    comps = [lm.lm_to_ints(np.asarray(lm.from_mont(
        plane[i * NL:(i + 1) * NL, :], lm.FQ))) for i in range(2 * k)]
    inf = np.asarray(plane[2 * k * NL])
    out = []
    for t in range(plane.shape[-1]):
        if inf[t] == 1:
            out.append(None)
        elif k == 1:
            out.append((comps[0][t], comps[1][t]))
        else:
            out.append(((comps[0][t], comps[1][t]),
                        (comps[2][t], comps[3][t])))
    return out


def _run_fold(kind, pairs):
    """pairs: [(P, Q)] host points/None -> fold result vs host adds."""
    grp = ec.G1 if kind == "g1" else ec.G2
    tab = ec_affine.affine_table([p for p, _ in pairs] +
                                 [q for _, q in pairs], kind)
    x = jnp.asarray(tab.T[None])                 # (1, arows, 2n)
    out = jax.jit(lambda v: ec_affine.fold_affine(v, kind))(x)
    got = _aff_to_host(out[0], kind)
    want = [grp.add(p, q) for p, q in pairs]
    assert got == want, (kind, got, want)


def test_fold_affine_g1_cases():
    P, Q = ec.g1_mul(5), ec.g1_mul(9)
    cases = [
        (P, Q),                      # generic add
        (P, P),                      # doubling
        (P, ec.G1.neg(P)),           # P + (-P) = inf
        (None, Q), (P, None),        # identity operands
        (None, None),                # inf + inf
        (ec.g1_mul(7), ec.g1_mul(11)),
        (ec.G1.neg(P), ec.G1.neg(P)),  # doubling of a negative
    ]
    _run_fold("g1", cases)


def test_fold_affine_g2_cases():
    P, Q = ec.g2_mul(5), ec.g2_mul(9)
    cases = [
        (P, Q), (P, P), (P, ec.G2.neg(P)),
        (None, Q), (P, None), (None, None),
        (ec.g2_mul(7), ec.g2_mul(11)),
        (ec.G2.neg(Q), Q),
    ]
    _run_fold("g2", cases)


def test_fold_chain_matches_sum():
    """Fold a 16-point vector down to the total; equals host sum."""
    for kind, gmul, grp in (("g1", ec.g1_mul, ec.G1),
                            ("g2", ec.g2_mul, ec.G2)):
        pts = [gmul(3 + j) for j in range(14)] + [None, None]
        x = jnp.asarray(ec_affine.affine_table(pts, kind).T[None])
        while x.shape[-1] > 1:
            x = ec_affine.fold_affine(x, kind)
        got = _aff_to_host(x[0], kind)[0]
        want = None
        for p in pts:
            want = grp.add(want, p)
        assert got == want


def test_neg_and_projective_roundtrip():
    for kind, gmul, to_aff in (("g1", ec.g1_mul, ec_lm.g1_plane_to_affine),
                               ("g2", ec.g2_mul, ec_lm.g2_plane_to_affine)):
        grp = ec.G1 if kind == "g1" else ec.G2
        pts = [gmul(3), None, gmul(8)]
        x = jnp.asarray(ec_affine.affine_table(pts, kind).T)
        nx = ec_affine.neg_affine(x, kind)
        assert _aff_to_host(nx, kind) == [grp.neg(p) for p in pts]
        proj = ec_affine.to_projective(x, kind)
        assert to_aff(proj) == pts

"""Proving-key derivation from a powers-of-tau ceremony (ptau -> pk).

The reference produces its proving key with snarkjs: phase-1 powers of
tau, `prepare phase2` (Lagrange-ification of the power tables), then
`groth16 setup` combining them with the R1CS
(/root/reference/circuit/circuit-compiler.sh:52-136).  This module is the
native equivalent: given a parsed `.ptau` (utils/serialize.read_ptau) and
our constraint system, it derives the full Groth16 proving key WITHOUT
knowing tau/alpha/beta — only the phase-2 delta is local (dev-derived
here; a real phase-2 ceremony would contribute it).

Math (domain size n, root w, coset shift s):
  [L_r(tau)]G      = EC-iNTT over [tau^j]G         (Lagrange-ification)
  A_i(tau)G1       = sum_r a_{r,i} [L_r(tau)]G1    (sparse per-wire combo)
  K_i              = beta*A_i + alpha*B_i + C_i    (via [alpha tau^j]G1 /
                                                    [beta tau^j]G1 tables)
  k_g1[i]          = K_i / delta  (private wires);  IC = K_i (publics,
                                                    gamma = 1 as snarkjs)
  H_j (coset-Lagrange layout, groth16/setup.py:15) =
      [L^coset_j(tau) Z(tau) / ((s^n-1) delta)]G1,
      from P_i = s^{-i} (tau^{n+i} - tau^i)G1 followed by an EC-iNTT.

All EC heavy lifting runs in the native C++ library (utils/native.py:
scale/add/segsum batches); the EC-iNTT is log n stages of one pairwise
scalar-mul batch + two pairwise adds.

Validation: with a dev ptau generated from the same seed, the derived key
is POINT-FOR-POINT equal to groth16.setup.dev_setup's key, and proofs
under it verify (tests/test_ceremony.py).
"""
from __future__ import annotations

from ..models import r1cs  # noqa: F401  (type context)
from ..ops import ec, ff
from ..utils import native
from ..utils.serialize import PtauData
from . import poly, qap
from .setup import ProvingKey, _derive_scalars, _g1j, _g2j
from .verify import VerifyingKey

P = ff.P_FR
Q = ff.P_FQ


def _g1_neg(p):
    return None if p is None else (p[0], (Q - p[1]) % Q)


def _g2_neg(p):
    if p is None:
        return None
    (x0, x1), (y0, y1) = p
    return ((x0, x1), ((Q - y0) % Q, (Q - y1) % Q))


def _bitrev_perm(xs):
    n = len(xs)
    bits = n.bit_length() - 1
    out = [None] * n
    for i, x in enumerate(xs):
        out[int(bin(i)[2:].zfill(bits)[::-1] or "0", 2)] = x
    return out


def _ec_ntt(points, root, scale_batch, add_batch, neg):
    """In-place-style radix-2 NTT over an EC point vector:
    out_r = sum_j root^{rj} P_j.  One scalar-mul batch + two add batches
    per stage (the butterflies of SURVEY §3.3 hot loop #2, on points)."""
    n = len(points)
    x = _bitrev_perm(points)
    size = 2
    while size <= n:
        half = size // 2
        step = pow(root, n // size, P)
        tws, his, los, hi_pos, lo_pos = [], [], [], [], []
        for b in range(0, n, size):
            w = 1
            for j in range(half):
                lo_pos.append(b + j)
                hi_pos.append(b + half + j)
                los.append(x[b + j])
                his.append(x[b + half + j])
                tws.append(w)
                w = w * step % P
        t = scale_batch(tws, his)
        new_lo = add_batch(los, t)
        new_hi = add_batch(los, [neg(p) for p in t])
        for pos, v in zip(lo_pos, new_lo):
            x[pos] = v
        for pos, v in zip(hi_pos, new_hi):
            x[pos] = v
        size *= 2
    return x


def ec_lagrange_g1(powers):
    """[tau^j]G1 (natural order, len n) -> [L_r(tau)]G1."""
    n = len(powers)
    winv = ff.inv_mod(poly.root_of_unity(n.bit_length() - 1), P)
    ninv = ff.inv_mod(n, P)
    out = _ec_ntt(powers, winv, native.g1_scale_batch, native.g1_add_batch,
                  _g1_neg)
    return native.g1_scale_batch([ninv] * n, out)


def ec_lagrange_g2(powers):
    n = len(powers)
    winv = ff.inv_mod(poly.root_of_unity(n.bit_length() - 1), P)
    ninv = ff.inv_mod(n, P)
    out = _ec_ntt(powers, winv, native.g2_scale_batch, native.g2_add_batch,
                  _g2_neg)
    return native.g2_scale_batch([ninv] * n, out)


def _wire_combo(entries, lagr, segsum, m):
    """entries: [(row, wire, coeff)] -> per-wire sums over lagr points."""
    if not entries:
        return [None] * m
    scale = native.g1_scale_batch if segsum is native.g1_segsum \
        else native.g2_scale_batch
    pts = scale([c for _, _, c in entries], [lagr[r] for r, _, _ in entries])
    return segsum(pts, [w for _, w, _ in entries], m)


def dev_ptau(power: int, seed: bytes = b"zkfranchise-dev-setup") -> PtauData:
    """Deterministic phase-1 ceremony transcript: same toxic-waste
    derivation as setup.dev_setup so derived keys can be cross-checked
    point-for-point.  Capacity 2^power (2*2^power-1 G1 powers, like
    snarkjs powersoftau)."""
    tw = _derive_scalars(seed, ["tau", "alpha", "beta"])
    tau, alpha, beta = tw["tau"], tw["alpha"], tw["beta"]
    n = 1 << power
    taus = [pow(tau, i, P) for i in range(2 * n - 1)]
    return PtauData(
        power=power,
        tau_g1=native.g1_fixed_base_mul(taus),
        tau_g2=native.g2_fixed_base_mul(taus[:n]),
        alpha_tau_g1=native.g1_fixed_base_mul(
            [alpha * t % P for t in taus[:n]]),
        beta_tau_g1=native.g1_fixed_base_mul(
            [beta * t % P for t in taus[:n]]),
        beta_g2=native.g2_fixed_base_mul([beta])[0],
    )


def verify_pk(pk, cs, ptau: PtauData | None = None,
              phase2_seed: bytes = b"zkfranchise-dev-setup",
              samples: int = 3, rng_seed: int = 0) -> bool:
    """The snarkjs `zkey verify` equivalent
    (/root/reference/circuit/circuit-compiler.sh:120,131).

    With a ptau transcript: re-derives the whole proving key from the
    powers + R1CS and compares point-for-point (the strongest check).
    Without one: pairing self-consistency checks —
        e(beta_g1, G2) == e(G1, beta_g2),
        e(delta_g1, G2) == e(G1, delta_g2),
        e(b_g1[i], G2) == e(G1, b_g2[i]) for sampled wires
    — which bind the G1/G2 halves of the key to the same scalars."""
    import random

    from ..ops import pairing

    if ptau is not None:
        pk2, _ = pk_from_ptau(ptau, cs, phase2_seed)
        return all(getattr(pk, f) == getattr(pk2, f) for f in
                   ("alpha_g1", "beta_g1", "beta_g2", "delta_g1",
                    "delta_g2", "a_g1", "b_g1", "b_g2", "k_g1", "h_g1"))

    def same_scalar(p1, q2) -> bool:
        # e(p1, G2) == e(G1, q2)  <=>  e(p1, G2) * e(-G1, q2) == 1
        return pairing.multi_pairing_check(
            [(p1, ec.G2_GEN), (ec.G1.neg(ec.G1_GEN), q2)])

    if not same_scalar(pk.beta_g1, pk.beta_g2):
        return False
    if not same_scalar(pk.delta_g1, pk.delta_g2):
        return False
    rng = random.Random(rng_seed)
    idx = [i for i in range(len(pk.b_g1)) if pk.b_g1[i] is not None]
    for i in rng.sample(idx, min(samples, len(idx))):
        if (pk.b_g2[i] is None) or not same_scalar(pk.b_g1[i], pk.b_g2[i]):
            return False
    return True


def pk_from_ptau(ptau: PtauData, cs,
                 phase2_seed: bytes = b"zkfranchise-dev-setup"
                 ) -> tuple[ProvingKey, VerifyingKey]:
    """Derive the full proving key from ceremony powers + our R1CS.
    Uses NO toxic waste except the local phase-2 delta."""
    m = cs.num_vars
    npub = cs.num_public
    n = qap.domain_size(cs.num_constraints, npub)
    assert len(ptau.tau_g1) >= 2 * n - 1, "ptau capacity too small"
    assert len(ptau.tau_g2) >= n
    assert len(ptau.alpha_tau_g1) >= n and len(ptau.beta_tau_g1) >= n
    delta = _derive_scalars(phase2_seed, ["delta"])["delta"]
    dinv = ff.inv_mod(delta, P)

    lag1 = ec_lagrange_g1(ptau.tau_g1[:n])
    lag2 = ec_lagrange_g2(ptau.tau_g2[:n])
    lag_a = ec_lagrange_g1(ptau.alpha_tau_g1[:n])   # [alpha L_r]G1
    lag_b = ec_lagrange_g1(ptau.beta_tau_g1[:n])    # [beta  L_r]G1

    rows = list(cs.constraints) + qap.binding_rows(npub)
    ent = {0: [], 1: [], 2: []}
    for r, con in enumerate(rows):
        for sel in (0, 1, 2):
            for i, cf in con[sel].items():
                ent[sel].append((r, i, cf))

    a_g1 = _wire_combo(ent[0], lag1, native.g1_segsum, m)
    b_g1 = _wire_combo(ent[1], lag1, native.g1_segsum, m)
    b_g2 = _wire_combo(ent[1], lag2, native.g2_segsum, m)
    # K_i = beta A_i + alpha B_i + C_i, via the alpha/beta power tables
    k_ba = _wire_combo(ent[0], lag_b, native.g1_segsum, m)
    k_ab = _wire_combo(ent[1], lag_a, native.g1_segsum, m)
    k_c = _wire_combo(ent[2], lag1, native.g1_segsum, m)
    k_all = native.g1_add_batch(native.g1_add_batch(k_ba, k_ab), k_c)

    ic = k_all[:npub + 1]
    k_priv = native.g1_scale_batch([dinv] * (m - npub - 1),
                                   k_all[npub + 1:])

    # H table in the coset-Lagrange layout (groth16/setup.py:99-105)
    s = poly.COSET_SHIFT
    sinv = ff.inv_mod(s, P)
    diff = native.g1_add_batch(
        ptau.tau_g1[n:2 * n],
        [_g1_neg(p) for p in ptau.tau_g1[:n]])       # [tau^{n+i}-tau^i]G1
    pre = native.g1_scale_batch(
        [pow(sinv, i, P) for i in range(n)], diff)
    h_lag = ec_lagrange_g1(pre)                      # [L^coset_j Z(tau)]G1
    c0 = ff.inv_mod((pow(s, n, P) - 1) % P, P) * dinv % P
    h_g1 = native.g1_scale_batch([c0] * n, h_lag)

    alpha_g1 = ptau.alpha_tau_g1[0]
    beta_g1 = ptau.beta_tau_g1[0]
    beta_g2 = ptau.beta_g2
    delta_g1 = native.g1_fixed_base_mul([delta])[0]
    delta_g2 = native.g2_fixed_base_mul([delta])[0]

    vk = VerifyingKey({
        "protocol": "groth16", "curve": "bn128", "nPublic": npub,
        "vk_alpha_1": _g1j(alpha_g1),
        "vk_beta_2": _g2j(beta_g2),
        "vk_gamma_2": _g2j(ec.G2_GEN),
        "vk_delta_2": _g2j(delta_g2),
        "IC": [_g1j(x) for x in ic],
    })
    pk = ProvingKey(
        n_vars=m, n_public=npub, domain=n,
        alpha_g1=alpha_g1, beta_g1=beta_g1, beta_g2=beta_g2,
        delta_g1=delta_g1, delta_g2=delta_g2,
        a_g1=a_g1, b_g1=b_g1, b_g2=b_g2, k_g1=k_priv, h_g1=h_g1,
    )
    return pk, vk

"""snarkjs binary container tests: zkey/ptau write -> read roundtrip."""
import random

from zkfranchise_tpu.ops import ec
from zkfranchise_tpu.utils import serialize as ser

RNG = random.Random(123)


def _g1():
    return ec.g1_mul(RNG.randrange(1, ec.R_ORDER))


def _g2():
    return ec.g2_mul(RNG.randrange(1, ec.R_ORDER))


def test_zkey_roundtrip():
    z = ser.ZkeyData(
        n_vars=5, n_public=2, domain=8,
        alpha_g1=_g1(), beta_g1=_g1(), beta_g2=_g2(), gamma_g2=ec.G2_GEN,
        delta_g1=_g1(), delta_g2=_g2(),
        ic=[_g1() for _ in range(3)],
        coeffs=[(0, 0, 1, 12345), (1, 2, 3, ser.ff.P_FR - 1)],
        a_g1=[_g1() for _ in range(5)] + [None],
        b_g1=[_g1() for _ in range(5)],
        b_g2=[_g2() for _ in range(5)],
        c_g1=[_g1() for _ in range(2)],
        h_g1=[_g1() for _ in range(8)],
    )
    data = ser.write_zkey(z)
    back = ser.read_zkey(data)
    assert back.n_vars == 5 and back.n_public == 2 and back.domain == 8
    assert back.alpha_g1 == z.alpha_g1
    assert back.beta_g2 == z.beta_g2
    assert back.gamma_g2 == ec.G2_GEN
    assert back.ic == z.ic
    assert back.coeffs == z.coeffs
    assert back.a_g1 == z.a_g1
    assert back.b_g2 == z.b_g2
    assert back.h_g1 == z.h_g1


def test_ptau_roundtrip():
    p = ser.PtauData(
        power=3,
        tau_g1=[_g1() for _ in range(15)],
        tau_g2=[_g2() for _ in range(8)],
        alpha_tau_g1=[_g1() for _ in range(8)],
        beta_tau_g1=[_g1() for _ in range(8)],
        beta_g2=_g2(),
    )
    back = ser.read_ptau(ser.write_ptau(p))
    assert back.power == 3
    assert back.tau_g1 == p.tau_g1
    assert back.tau_g2 == p.tau_g2
    assert back.beta_g2 == p.beta_g2

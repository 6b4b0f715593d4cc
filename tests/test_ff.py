"""Host bigint field-reference tests (ops/ff.py).

The device field core is ops/lm.py (tested in test_lm.py); ff.py is the
pure-Python oracle those tests compare against, plus the BigToFF edge-case
semantics of /root/reference/internal/helpers.go:17-26.
"""
import random

from zkfranchise_tpu.ops import ff

RNG = random.Random(0xBEEF)


def rand_fq(n):
    return [RNG.randrange(ff.P_FQ) for _ in range(n)]


def test_host_reference_helpers():
    assert ff.big_to_ff(ff.P_FR) == 0
    assert ff.big_to_ff(5) == 5
    assert ff.big_to_ff(ff.P_FR + 7) == 7
    x = RNG.randrange(1, ff.P_FQ)
    assert x * ff.inv_mod(x, ff.P_FQ) % ff.P_FQ == 1
    xs = rand_fq(10) + [0]
    invs = ff.batch_inv(xs, ff.P_FQ)
    for x, ix in zip(xs, invs):
        assert (x == 0 and ix == 0) or x * ix % ff.P_FQ == 1
    r = ff.sqrt_mod(x * x % ff.P_FQ, ff.P_FQ)
    assert r is not None and r * r % ff.P_FQ == x * x % ff.P_FQ

"""Device pairing (ops/pairing_jax.py) vs the exact host pairing.

The device Miller loop and final exponentiation are designed to produce
the *same Fq12 element* as curves/bls12_381.py (no per-line scaling), so
every comparison is exact equality, not just pairing-class equality.
"""

import random

import os

import jax
import pytest

e2e = pytest.mark.skipif(
    not os.environ.get("MASP_E2E"),
    reason="~10 min on CPU; run with MASP_E2E=1",
)

from masp_tpu.curves.bls12_381 import (
    G1, G2, Q, R, Fq2, Fq12,
    final_exponentiation, multi_miller_loop,
)
from masp_tpu.ops import pairing_jax as PJ


def _rand_fq12(rng):
    from masp_tpu.curves.bls12_381 import Fq6

    def f2():
        return Fq2(rng.randrange(Q), rng.randrange(Q))

    def f6():
        return Fq6(f2(), f2(), f2())

    return Fq12(f6(), f6())


def test_fq12_tower_ops_match_host():
    rng = random.Random(31)
    a, b = _rand_fq12(rng), _rand_fq12(rng)
    da, db = PJ.encode_fq12(a), PJ.encode_fq12(b)

    @jax.jit
    def all_ops(x, y):
        return (PJ.f12mul(x, y), PJ.f12conj(x), PJ.f12inv(x),
                PJ.f12frobenius2(x))

    mul, conj, inv_d, frob2 = all_ops(da, db)
    assert PJ.decode_fq12(mul) == a * b
    assert PJ.decode_fq12(conj) == a.conjugate()
    inv = a.invert()
    assert inv is not None
    assert PJ.decode_fq12(inv_d) == inv
    assert PJ.decode_fq12(frob2) == a.frobenius().frobenius()


@e2e
def test_miller_and_final_exp_match_host():
    rng = random.Random(32)
    pairs = [
        (G1.generator() * rng.randrange(1, R), G2.generator() * rng.randrange(1, R))
        for _ in range(2)
    ]
    want_miller = multi_miller_loop(pairs)

    coords = PJ.encode_pairs(pairs)
    got_miller_dev = PJ.multi_miller_loop_device(*coords)
    got_miller = PJ.decode_fq12(
        jax.tree_util.tree_map(lambda x: x[0], got_miller_dev)
    )
    assert got_miller == want_miller

    want_final = final_exponentiation(want_miller)
    got_final = PJ.decode_fq12(
        jax.tree_util.tree_map(
            lambda x: x[0], PJ.final_exponentiation_device(got_miller_dev)
        )
    )
    assert got_final == want_final


@e2e
def test_pairing_product_check_device():
    rng = random.Random(33)
    p = G1.generator() * rng.randrange(1, R)
    q = G2.generator() * rng.randrange(1, R)
    # e(P, Q) * e(-P, Q) == 1
    assert PJ.pairing_product_is_one_device([(p, q), (-p, q)])
    # identity pairs contribute 1
    assert PJ.pairing_product_is_one_device([(G1.identity(), q)])
    # a non-degenerate single pairing is NOT 1
    assert not PJ.pairing_product_is_one_device([(p, q), (p, q)])

"""Jubjub curve tests: group law, encoding, cofactor semantics."""

import random

from masp_tpu.curves.jubjub import EDWARDS_D, ExtendedPoint, subgroup_from_bytes
from masp_tpu.fields import JubjubFr, Scalar
from masp_tpu.primitives.constants import spending_key_generator


def test_on_curve_identity():
    p = ExtendedPoint.identity()
    assert p.is_identity()
    assert (p + p).is_identity()
    assert p.double().is_identity()


def _on_curve(p: ExtendedPoint) -> bool:
    u, v = p.to_affine()
    # -u^2 + v^2 = 1 + d u^2 v^2
    return -u.square() + v.square() == Scalar(1) + EDWARDS_D * u.square() * v.square()


def test_group_law():
    g = spending_key_generator()
    assert _on_curve(g)
    assert _on_curve(g + g)
    assert g.double() == g + g
    assert g.double().double() == g + g + g + g
    assert (g - g).is_identity()
    k1 = JubjubFr(12345)
    k2 = JubjubFr(67890)
    assert g * k1 + g * k2 == g * (k1 + k2)


def test_encoding_roundtrip():
    rng = random.Random(0x59)
    g = spending_key_generator()
    for _ in range(20):
        p = g * JubjubFr(rng.randrange(JubjubFr.META.modulus))
        b = p.to_bytes()
        q = ExtendedPoint.from_bytes(b)
        assert q is not None and q == p
        assert q.to_bytes() == b


def test_torsion_and_cofactor():
    g = spending_key_generator()
    assert g.is_torsion_free()
    assert g.is_prime_order()
    # order of the subgroup
    assert g.mul_scalar_int(JubjubFr.META.modulus).is_identity()
    assert subgroup_from_bytes(g.to_bytes()) is not None


def test_identity_encoding():
    ident = ExtendedPoint.identity()
    b = ident.to_bytes()
    assert b == bytes([1] + [0] * 31)
    p = ExtendedPoint.from_bytes(b)
    assert p is not None and p.is_identity()
    # -0 (sign bit set on identity v-coordinate) rejected under ZIP-216
    b2 = bytearray(b)
    b2[31] |= 0x80
    assert ExtendedPoint.from_bytes(bytes(b2)) is None
    assert ExtendedPoint.from_bytes_pre_zip216(bytes(b2)) is not None

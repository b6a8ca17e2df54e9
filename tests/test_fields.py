"""Host field arithmetic tests (gold layer)."""

import random

from masp_tpu.fields import Scalar, Fq, JubjubFr, SCALAR_MODULUS, FQ_MODULUS, JUBJUB_FR_MODULUS


def test_moduli_bitlengths():
    assert Scalar.META.num_bits == 255
    assert Fq.META.num_bits == 381
    assert JubjubFr.META.num_bits == 252


def test_scalar_repr_roundtrip():
    rng = random.Random(0x5862)
    for _ in range(100):
        x = Scalar(rng.randrange(SCALAR_MODULUS))
        assert Scalar.from_bytes(x.to_bytes()) == x
    # non-canonical encodings rejected
    assert Scalar.from_bytes(SCALAR_MODULUS.to_bytes(32, "little")) is None
    assert Scalar.from_bytes(b"\xff" * 32) is None


def test_field_algebra():
    rng = random.Random(1)
    for cls, mod in [(Scalar, SCALAR_MODULUS), (Fq, FQ_MODULUS), (JubjubFr, JUBJUB_FR_MODULUS)]:
        for _ in range(20):
            a = cls(rng.randrange(mod))
            b = cls(rng.randrange(mod))
            assert (a + b) - b == a
            assert a * b == b * a
            assert a.square() == a * a
            if not a.is_zero():
                assert a * a.invert() == cls.one()
        assert cls.zero().invert() is None


def test_sqrt():
    rng = random.Random(2)
    for cls in [Scalar, Fq, JubjubFr]:
        sq_count = 0
        for _ in range(40):
            a = cls(rng.randrange(cls.META.modulus))
            s = a.square()
            r = s.sqrt()
            assert r is not None and r.square() == s
            if a.sqrt() is not None:
                sq_count += 1
        # ~half of random elements are QRs
        assert 5 < sq_count < 36


def test_two_adicity():
    # NTT needs a large power-of-two subgroup in the circuit field.
    assert Scalar.META.two_adicity == 32
    w = Scalar(Scalar.META.root_of_unity)
    assert w ** (1 << 32) == Scalar.one()
    assert w ** (1 << 31) != Scalar.one()

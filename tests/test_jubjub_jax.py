"""Device Jubjub (ops/jubjub_jax.py) vs the exact host implementation
(curves/jubjub.py): complete addition, MSM through the sorted-prefix
engine, batched decompression, and the RedJubjub device batch verify."""

import os
import random

import numpy as np
import pytest

from masp_tpu.curves.jubjub import EDWARDS_D, ExtendedPoint
from masp_tpu.fields import SCALAR_MODULUS, JubjubFr, Scalar
from masp_tpu.ops import jubjub_jax as J
from masp_tpu.primitives.constants import spending_key_generator

Q_JUB = JubjubFr.META.modulus


def _rand_point(rng) -> ExtendedPoint:
    return spending_key_generator() * JubjubFr(rng.randrange(1, Q_JUB))


def _small_order() -> ExtendedPoint:
    # (0, -1) has order 2 on Jubjub
    return ExtendedPoint.from_affine(Scalar(0), Scalar(SCALAR_MODULUS - 1))


def test_completeness_preconditions():
    # bbjlp addition is complete iff a (= -1) is a square and d is not
    assert pow(SCALAR_MODULUS - 1, (SCALAR_MODULUS - 1) // 2, SCALAR_MODULUS) == 1
    assert pow(EDWARDS_D.n, (SCALAR_MODULUS - 1) // 2, SCALAR_MODULUS) != 1


def test_add_points_matches_host():
    rng = random.Random(71)
    ps = [_rand_point(rng) for _ in range(4)]
    qs = [_rand_point(rng) for _ in range(4)]
    # exercise every complete-addition case in one batch: generic, double,
    # inverse pair (-> identity), identity operand, small-order points
    ps += [ps[0], ps[1], ExtendedPoint.identity(), _small_order()]
    qs += [ps[0], -ps[1], ps[2], _small_order()]
    import jax.numpy as jnp

    P = tuple(jnp.asarray(x) for x in J.encode_points(ps))
    Q = tuple(jnp.asarray(x) for x in J.encode_points(qs))
    got = J.decode_points(*J.JubjubOps.add_points(P, Q))
    for g, p, q in zip(got, ps, qs):
        assert g == p + q


def test_msm_matches_host():
    rng = random.Random(72)
    n = 13  # deliberately not a power of two (exercises padding)
    points = [_rand_point(rng) for _ in range(n)]
    scalars = [rng.randrange(Q_JUB) for _ in range(n)]
    scalars[0] = 0
    points[1] = ExtendedPoint.identity()
    got = J.msm(points, scalars)
    want = ExtendedPoint.identity()
    for p, s in zip(points, scalars):
        want = want + p * JubjubFr(s)
    assert got == want
    assert J.msm([], []) == ExtendedPoint.identity()


def test_batch_sqrt_matches_host():
    import jax.numpy as jnp

    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops.field_jax import FR

    rng = random.Random(73)
    vals = [rng.randrange(SCALAR_MODULUS) for _ in range(14)] + [0, 1]
    a = jnp.asarray(F.encode(FR, vals))
    roots, ok = J.batch_sqrt(a)
    roots = F.decode(FR, np.asarray(roots))
    for val, root, is_sq in zip(vals, roots, np.asarray(ok)):
        host = Scalar(val).sqrt()
        assert bool(is_sq) == (host is not None)
        if host is not None:
            assert root * root % SCALAR_MODULUS == val


def test_batch_from_bytes_matches_host():
    from masp_tpu.curves.jubjub import batch_from_bytes as host_batch

    rng = random.Random(74)
    items = [(_rand_point(rng)).to_bytes() for _ in range(8)]
    items.append(ExtendedPoint.identity().to_bytes())
    items.append(_small_order().to_bytes())
    # invalid: v >= modulus (noncanonical field encoding)
    items.append((SCALAR_MODULUS + 1).to_bytes(32, "little"))
    # invalid: -0 (identity with sign bit set; ZIP-216 rejects)
    neg_zero = bytearray(ExtendedPoint.identity().to_bytes())
    neg_zero[31] |= 0x80
    items.append(bytes(neg_zero))
    # invalid: v whose u^2 is a non-residue (flip bytes until decode fails)
    bad = bytearray(items[0])
    while ExtendedPoint.from_bytes(bytes(bad)) is not None:
        bad[0] = (bad[0] + 1) & 0xFF
    items.append(bytes(bad))
    # wrong length
    items.append(b"\x00" * 31)

    got = J.batch_from_bytes(items)
    want = host_batch(items[:-1]) + [None]  # host helper assumes 32-byte items
    for g, w, raw in zip(got, want, items):
        assert (g is None) == (w is None), raw.hex()
        if w is not None:
            assert g == w, raw.hex()

    # pre-ZIP-216 semantics: -0 decodes
    assert J.batch_from_bytes([bytes(neg_zero)], zip_216_enabled=False)[0] is not None


def test_batch_epk_device_matches_host():
    """SaplingDomain.batch_epk (wallet-scanning hot loop) device vs host."""
    from masp_tpu.note_encryption.sapling_domain import SaplingDomain
    from masp_tpu.primitives.consensus import TEST_NETWORK

    rng = random.Random(76)
    domain = SaplingDomain(TEST_NETWORK, 10)
    eks = [(_rand_point(rng)).to_bytes() for _ in range(5)]
    eks.append(b"\xff" * 32)  # invalid encoding
    host = domain.batch_epk(eks, use_device=False)
    dev = domain.batch_epk(eks, use_device=True)
    assert len(host) == len(dev)
    for (hp, hek), (dp, dek) in zip(host, dev):
        assert hek == dek
        assert (hp is None) == (dp is None)
        if hp is not None:
            assert hp == dp


def test_batch_verify_device_matches_host():
    from masp_tpu.primitives import redjubjub as RJ
    from masp_tpu.utils.rng import XorShiftRng

    p_g = spending_key_generator()
    rng = random.Random(75)

    class _R:
        def fill_bytes(self, n):
            return rng.randbytes(n)

    entries = []
    for i in range(4):
        sk = RJ.PrivateKey(JubjubFr(rng.randrange(1, Q_JUB)))
        vk = RJ.PublicKey.from_private(sk, p_g)
        msg = f"msg-{i}".encode()
        entries.append(RJ.BatchEntry(vk=vk, msg=msg, sig=sk.sign(msg, _R(), p_g)))

    assert J.batch_verify_device(XorShiftRng.from_seed(b"\x05" * 16), entries, p_g)
    assert RJ.batch_verify(XorShiftRng.from_seed(b"\x06" * 16), entries, p_g)

    # corrupt one signature: both reject
    bad = list(entries)
    s = bytearray(bad[2].sig.sbar)
    s[0] ^= 1
    bad[2] = RJ.BatchEntry(vk=bad[2].vk, msg=bad[2].msg,
                           sig=RJ.Signature(bad[2].sig.rbar, bytes(s)))
    assert not J.batch_verify_device(XorShiftRng.from_seed(b"\x07" * 16), bad, p_g)
    assert not RJ.batch_verify(XorShiftRng.from_seed(b"\x08" * 16), bad, p_g)
    assert J.batch_verify_device(XorShiftRng.from_seed(b"\x09" * 16), [], p_g)

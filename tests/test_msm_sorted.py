"""sorted_msm vs host reference and vs the round-1 pippenger_msm."""

import numpy as np
import pytest

from masp_tpu.curves.bls12_381 import G1, G2, R
from masp_tpu.ops import msm as M
from masp_tpu.ops import msm_sorted as MS
from masp_tpu.ops import weierstrass_jax as W


def _host_msm(points, scalars):
    acc = type(points[0]).identity()
    for p, s in zip(points, scalars):
        acc = acc + p * s
    return acc


def _rand_scalars(rng, n):
    return [int.from_bytes(rng.bytes(32), "little") % R for _ in range(n)]


@pytest.mark.parametrize("c", [4, 8])
def test_sorted_msm_g1(c):
    rng = np.random.default_rng(5)
    n = 64
    g = G1.generator()
    points = [g * (int(rng.integers(1, 1 << 62))) for _ in range(n)]
    scalars = _rand_scalars(rng, n)
    # a couple of zero scalars and identity points (padding shapes)
    scalars[3] = 0
    points[7] = G1.identity()

    coords = [np.asarray(x) for x in W.encode_g1_points(points)]
    digits = M.scalars_to_digits(scalars, c, 256)
    packed = MS.pack_points(tuple(coords))
    out = MS.sorted_msm(W.G1Ops, packed, digits, c)
    got = W.decode_g1_points(*(np.asarray(x)[None] for x in out))[0]
    assert got == _host_msm(points, scalars)


def test_sorted_msm_matches_pippenger():
    rng = np.random.default_rng(7)
    n = 128
    g = G1.generator()
    points = [g * int(rng.integers(1, 1 << 62)) for _ in range(n)]
    scalars = _rand_scalars(rng, n)
    coords = [np.asarray(x) for x in W.encode_g1_points(points)]
    digits = M.scalars_to_digits(scalars, 8, 256)
    srt = MS.sorted_msm(W.G1Ops, MS.pack_points(tuple(coords)), digits, 8)
    import jax.numpy as jnp

    pip = M.pippenger_msm(W.G1Ops, tuple(coords), jnp.asarray(digits), c=8, lanes=4)
    a = W.decode_g1_points(*(np.asarray(x)[None] for x in srt))[0]
    b = W.decode_g1_points(*(np.asarray(x)[None] for x in pip))[0]
    assert a == b


def test_sorted_msm_g2():
    rng = np.random.default_rng(9)
    n = 32
    g = G2.generator()
    points = [g * int(rng.integers(1, 1 << 62)) for _ in range(n)]
    scalars = _rand_scalars(rng, n)
    scalars[0] = 0
    coords = [np.asarray(x) for x in W.encode_g2_points(points)]
    digits = M.scalars_to_digits(scalars, 8, 256)
    out = MS.sorted_msm(W.G2Ops, MS.pack_points(tuple(coords)), digits, 8)
    got = W.decode_g2_points(*(np.asarray(x)[None] for x in out))[0]
    assert got == _host_msm(points, scalars)

"""MSM and NTT device-path regression tests (compact impl, small sizes)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masp_tpu.curves.bls12_381 import G1, R
from masp_tpu.fields import SCALAR_MODULUS
from masp_tpu.groth16.domain import Domain
from masp_tpu.ops import field_jax as F
from masp_tpu.ops import msm as M
from masp_tpu.ops import weierstrass_jax as W


@pytest.mark.slow
def test_pippenger_small():
    rng = random.Random(11)
    N = 32
    pts = [G1.generator() * rng.randrange(R) for _ in range(N - 1)] + [G1.identity()]
    scalars = [rng.randrange(R) for _ in range(N - 1)] + [12345]
    expected = G1.identity()
    for p, s in zip(pts, scalars):
        expected = expected + p * s
    coords, digs = M.pad_points_for_msm(
        W.G1Ops, W.encode_g1_points, pts, scalars, lanes=8, c=8
    )
    coords = tuple(map(jnp.asarray, coords))
    digs = jnp.asarray(digs)
    out = jax.jit(lambda p, d: M.pippenger_msm(W.G1Ops, p, d, c=8, lanes=8))(
        coords, digs
    )
    got = W.decode_g1_points(*(np.asarray(x)[None] for x in out))[0]
    assert got == expected


@pytest.mark.slow
def test_fixed_base_small():
    rng = random.Random(12)
    scalars = [rng.randrange(R) for _ in range(16)]
    table = M.fixed_base_table(G1.generator(), c=8, num_bits=256)
    TX, TY, TZ = [], [], []
    for row in table:
        x, y, z = W.encode_g1_points(row)
        TX.append(x)
        TY.append(y)
        TZ.append(z)
    T = tuple(jnp.asarray(np.stack(v)) for v in (TX, TY, TZ))
    digits = jnp.asarray(M.scalars_to_digits(scalars, 8, 256))
    out = jax.jit(lambda t, d: M.fixed_base_scalarmuls(W.G1Ops, t, d))(T, digits)
    got = W.decode_g1_points(*out)
    for g, s in zip(got, scalars):
        assert g == G1.generator() * s


def test_ntt_roundtrip_and_convolution():
    m = 64
    dom = Domain(m)
    rng = random.Random(13)
    coeffs = [rng.randrange(SCALAR_MODULUS) for _ in range(m)]
    x = jnp.asarray(F.encode(F.FR, coeffs))
    back = jax.jit(lambda x: dom.ifft(dom.fft(x)))(x)
    assert F.decode(F.FR, back) == coeffs

    # evaluation property: fft output k equals poly(omega^k)
    evals = F.decode(F.FR, jax.jit(dom.fft)(x))
    for k in (0, 1, 5, 63):
        wk = pow(dom.omega, k, SCALAR_MODULUS)
        want = 0
        for i, c in enumerate(reversed(coeffs)):
            want = (want * wk + c) % SCALAR_MODULUS
        assert evals[k] == want

    # coset roundtrip + Z constant on coset
    back2 = jax.jit(lambda x: dom.icoset_fft(dom.coset_fft(x)))(x)
    assert F.decode(F.FR, back2) == coeffs
    g = dom.g
    assert (pow(g * pow(dom.omega, 7, SCALAR_MODULUS), m, SCALAR_MODULUS) - 1) % SCALAR_MODULUS == dom.z_on_coset


def test_digits():
    xs = [0, 1, 255, 256, (1 << 255) - 19]
    d = M.scalars_to_digits(xs, 8, 256)
    assert d[0].tolist() == [0] * 32
    assert d[1][0] == 1
    assert d[2][0] == 255 and d[2][1] == 0
    assert d[3][0] == 0 and d[3][1] == 1
    v = 0
    for w in range(32):
        v |= int(d[4][w]) << (8 * w)
    assert v == (1 << 255) - 19

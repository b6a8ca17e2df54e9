"""Pallas kernel tests — run only on real TPU hardware (Mosaic kernels;
interpret mode would recompile via XLA and defeat the point).

On CPU CI these skip; the same math is covered by the compact-impl tests.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires TPU (Mosaic kernels)"
)


def test_pallas_mont_mul_matches_host():
    from masp_tpu.curves.bls12_381 import Q
    from masp_tpu.kernels import field_kernels as K
    from masp_tpu.ops import field_jax as F

    rng = random.Random(3)
    xs = [rng.randrange(Q) for _ in range(512)]
    ys = [rng.randrange(Q) for _ in range(512)]
    a = jnp.asarray(F.encode(F.FQ, xs))
    b = jnp.asarray(F.encode(F.FQ, ys))
    got = F.decode(F.FQ, K.pallas_mont_mul(F.FQ, a, b))
    assert all(g == x * y % Q for g, x, y in zip(got, xs, ys))


def test_pallas_point_add_matches_host():
    from masp_tpu.curves.bls12_381 import G1, R
    from masp_tpu.kernels import field_kernels as K
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops import weierstrass_jax as W

    rng = random.Random(4)
    pts1 = [G1.generator() * rng.randrange(R) for _ in range(63)] + [G1.identity()]
    pts2 = [G1.generator() * rng.randrange(R) for _ in range(63)] + [G1.identity()]
    P = tuple(map(jnp.asarray, W.encode_g1_points(pts1)))
    Q_ = tuple(map(jnp.asarray, W.encode_g1_points(pts2)))
    out = K.pallas_point_add("g1", P, Q_, (F.FQ.L,))
    got = W.decode_g1_points(*out)
    assert all(g == (x + y) for g, x, y in zip(got, pts1, pts2))

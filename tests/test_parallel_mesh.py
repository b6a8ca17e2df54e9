"""Sharded-NTT tests on the virtual 8-device CPU mesh (compact impl).

The ppermute-butterfly path must agree bit-for-bit with the
single-device Domain transforms (groth16/domain.py), which themselves
match bellman's EvaluationDomain semantics. One test = one compiled
program set (shard_map compiles are the cost here, not the math).
"""

import random

import jax.numpy as jnp

from masp_tpu.fields import SCALAR_MODULUS
from masp_tpu.groth16.domain import Domain
from masp_tpu.ops import field_jax as F
from masp_tpu.ops.field_jax import FR
from masp_tpu.parallel import mesh as PM


def test_sharded_ntt_matches_and_roundtrips():
    m = 64
    dom = Domain(m)
    rng = random.Random(21)
    vals = [rng.randrange(SCALAR_MODULUS) for _ in range(m)]
    x = jnp.asarray(F.encode(FR, vals))
    mesh = PM.make_mesh(8, axis="ntt")

    fwd = PM.sharded_ntt(mesh, dom, x, axis="ntt")
    assert F.decode(FR, fwd) == F.decode(FR, dom.fft(x))

    back = F.decode(FR, PM.sharded_ntt(mesh, dom, fwd, axis="ntt", inverse=True))
    assert back == vals


def test_sharded_ntt_degenerate_single_device():
    m = 16
    dom = Domain(m)
    rng = random.Random(23)
    vals = [rng.randrange(SCALAR_MODULUS) for _ in range(m)]
    x = jnp.asarray(F.encode(FR, vals))
    mesh = PM.make_mesh(1, axis="ntt")
    got = F.decode(FR, PM.sharded_ntt(mesh, dom, x, axis="ntt"))
    assert got == F.decode(FR, dom.fft(x))

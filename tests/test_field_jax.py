"""JAX limb field kernels vs the host gold layer."""

import random

import jax
import jax.numpy as jnp
import pytest

from masp_tpu.ops import field_jax as F


def _sample(spec, n, seed=42):
    rng = random.Random(seed)
    xs = [rng.randrange(spec.modulus) for _ in range(n)]
    xs[0] = 0
    xs[1] = spec.modulus - 1
    xs[2] = 1
    return xs


@pytest.mark.parametrize("spec", [F.FR, F.FQ], ids=["Fr", "Fq"])
def test_mul_add_sub_compact(spec):
    """The compact (scan-based) impl used by CPU tests and the multi-chip
    dry-run must match the host field exactly, incl. edge values."""
    prev = F.get_impl()
    F.set_impl("compact")
    try:
        n = 65
        xs = _sample(spec, n)
        ys = _sample(spec, n, seed=44)
        a = jnp.asarray(F.encode(spec, xs))
        b = jnp.asarray(F.encode(spec, ys))
        got_mul = F.decode(spec, jax.jit(lambda a, b: F.mont_mul(spec, a, b))(a, b))
        got_sub = F.decode(spec, jax.jit(lambda a, b: F.sub(spec, a, b))(a, b))
        for g, x, y in zip(got_mul, xs, ys):
            assert g == (x * y) % spec.modulus
        for g, x, y in zip(got_sub, xs, ys):
            assert g == (x - y) % spec.modulus
    finally:
        F.set_impl(prev)


@pytest.mark.parametrize("spec", [F.FR, F.FQ], ids=["Fr", "Fq"])
def test_mul_add_sub(spec):
    n = 65
    xs = _sample(spec, n)
    ys = _sample(spec, n, seed=43)
    a = jnp.asarray(F.encode(spec, xs))
    b = jnp.asarray(F.encode(spec, ys))
    got_mul = F.decode(spec, jax.jit(lambda a, b: F.mont_mul(spec, a, b))(a, b))
    got_add = F.decode(spec, jax.jit(lambda a, b: F.add(spec, a, b))(a, b))
    got_sub = F.decode(spec, jax.jit(lambda a, b: F.sub(spec, a, b))(a, b))
    got_neg = F.decode(spec, jax.jit(lambda a: F.neg(spec, a))(a))
    for g, x, y in zip(got_mul, xs, ys):
        assert g == (x * y) % spec.modulus
    for g, x, y in zip(got_add, xs, ys):
        assert g == (x + y) % spec.modulus
    for g, x, y in zip(got_sub, xs, ys):
        assert g == (x - y) % spec.modulus
    for g, x in zip(got_neg, xs):
        assert g == (-x) % spec.modulus


def test_mont_roundtrip():
    spec = F.FR
    xs = _sample(spec, 17)
    a = jnp.asarray(F.encode(spec, xs, mont=False))
    m = jax.jit(lambda a: F.to_mont(spec, a))(a)
    back = jax.jit(lambda a: F.from_mont(spec, a))(m)
    assert F.decode(spec, back, mont=False) == xs


@pytest.mark.slow
def test_inv():
    spec = F.FR
    xs = _sample(spec, 33)
    a = jnp.asarray(F.encode(spec, xs))
    got = F.decode(spec, jax.jit(lambda a: F.mont_inv(spec, a))(a))
    for g, x in zip(got, xs):
        assert g == (pow(x, -1, spec.modulus) if x else 0)


@pytest.mark.slow
def test_batch_inv():
    spec = F.FR
    xs = _sample(spec, 64)
    a = jnp.asarray(F.encode(spec, xs))
    got = F.decode(spec, jax.jit(lambda a: F.batch_mont_inv(spec, a))(a))
    for g, x in zip(got, xs):
        assert g == (pow(x, -1, spec.modulus) if x else 0)


def test_mont_inv_small_matches_host():
    """mont_inv_small (unrolled 4-bit-window Fermat for tiny widths — the
    batch-affine ladder's per-level root inverse) vs host pow."""
    import numpy as np

    rng = np.random.default_rng(41)
    for spec in (F.FQ, F.FR):
        vals = [int.from_bytes(rng.bytes(48), "little") % spec.modulus
                for _ in range(4)]
        vals[0] = 1
        arr = F.encode(spec, vals)
        inv = F.decode(spec, np.asarray(F.mont_inv_small(spec, jnp.asarray(arr))))
        for v, iv in zip(vals, inv):
            assert (v * iv) % spec.modulus == 1

"""Batched BLS12-381 G1/G2 group ops on TPU (projective, branch-free).

Replaces nam-blst's point pipelines (SURVEY.md §2.4) with complete
Renes-Costello-Batina additions for j-invariant-0 curves: no doubling or
identity special cases, so the whole formula is one fused XLA kernel —
exactly what the TPU wants (no data-dependent control flow).

Generic over a small "field ops" object so the same code drives
G1 (Fq) and G2 (Fq2 = Fq[u]/(u^2+1)).

Point layout: (X, Y, Z) projective; identity = (0, 1, 0).
Coordinates are Montgomery limb arrays: Fq -> (..., L); Fq2 -> (..., 2, L).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from masp_tpu.curves.bls12_381 import Q
from masp_tpu.ops import field_jax as F
from masp_tpu.ops.field_jax import FQ


class FqOps:
    """Fq element ops on (..., L) limb arrays."""

    spec = FQ
    coord_shape = (FQ.L,)

    @staticmethod
    def mul(a, b):
        return F.mont_mul(FQ, a, b)

    @staticmethod
    def add(a, b):
        return F.add(FQ, a, b)

    @staticmethod
    def sub(a, b):
        return F.sub(FQ, a, b)

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def one_like(a):
        return jnp.broadcast_to(jnp.asarray(FQ.ONE_MONT, dtype=jnp.uint32), a.shape)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=-1)

    @staticmethod
    def inv(a):
        return F.mont_inv(FQ, a)

    @staticmethod
    def batch_inv(a):
        return F.batch_mont_inv(FQ, a)

    # encode/decode: ints <-> limbs
    @staticmethod
    def encode(vals: list[int]) -> np.ndarray:
        return F.encode(FQ, vals)

    @staticmethod
    def decode(arr) -> list[int]:
        return F.decode(FQ, arr)


class Fq2Ops:
    """Fq2 element ops on (..., 2, L) limb arrays (c0, c1 stacked)."""

    spec = FQ
    coord_shape = (2, FQ.L)

    @staticmethod
    def mul(a, b):
        # Karatsuba with the 3 products STACKED into one mont_mul call
        # and the independent subtractions paired: the traced graph is
        # the same size as an Fq mul (tensors 3x larger instead — free
        # for tracing/XLA:CPU compile, and bigger fused device kernels).
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        lhs = jnp.stack([a0, a1, F.add(FQ, a0, a1)], axis=0)
        rhs = jnp.stack([b0, b1, F.add(FQ, b0, b1)], axis=0)
        p = F.mont_mul(FQ, lhs, rhs)  # v0, v1, s
        v0, v1, s = p[0], p[1], p[2]
        d = F.sub(FQ, jnp.stack([v0, s], axis=0), jnp.stack([v1, v0], axis=0))
        c0, t = d[0], d[1]
        c1 = F.sub(FQ, t, v1)
        return jnp.stack([c0, c1], axis=-2)

    @staticmethod
    def add(a, b):
        # limb arithmetic treats every leading axis as batch: one call
        # over the stacked (..., 2, L) coefficients
        return F.add(FQ, a, b)

    @staticmethod
    def sub(a, b):
        return F.sub(FQ, a, b)

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def one_like(a):
        one = jnp.broadcast_to(jnp.asarray(FQ.ONE_MONT, dtype=jnp.uint32), a[..., 0, :].shape)
        return jnp.stack([one, jnp.zeros_like(one)], axis=-2)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(-1, -2))

    @staticmethod
    def inv(a):
        # 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2)
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = F.add(FQ, F.mont_mul(FQ, a0, a0), F.mont_mul(FQ, a1, a1))
        ninv = F.mont_inv(FQ, norm)
        c0 = F.mont_mul(FQ, a0, ninv)
        c1 = F.neg(FQ, F.mont_mul(FQ, a1, ninv))
        return jnp.stack([c0, c1], axis=-2)

    @staticmethod
    def batch_inv(a):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = F.add(FQ, F.mont_mul(FQ, a0, a0), F.mont_mul(FQ, a1, a1))
        ninv = F.batch_mont_inv(FQ, norm)
        c0 = F.mont_mul(FQ, a0, ninv)
        c1 = F.neg(FQ, F.mont_mul(FQ, a1, ninv))
        return jnp.stack([c0, c1], axis=-2)

    @staticmethod
    def encode(vals: list[tuple[int, int]]) -> np.ndarray:
        c0 = F.encode(FQ, [v[0] for v in vals])
        c1 = F.encode(FQ, [v[1] for v in vals])
        return np.stack([c0, c1], axis=-2)

    @staticmethod
    def decode(arr) -> list[tuple[int, int]]:
        arr = np.asarray(arr)
        c0 = F.decode(FQ, arr[..., 0, :])
        c1 = F.decode(FQ, arr[..., 1, :])
        return list(zip(c0, c1))


def _mul_small(fops, a, k: int):
    """a * small-int k via doubling chain (k in {3, 12} here)."""
    if k == 3:
        return fops.add(fops.add(a, a), a)
    if k == 12:
        t = fops.add(fops.add(a, a), a)  # 3a
        t = fops.add(t, t)  # 6a
        return fops.add(t, t)  # 12a
    raise ValueError(k)


def point_add(fops, p, q):
    """Complete projective addition (RCB'15 Algorithm 7, a = 0).

    p, q: tuples (X, Y, Z); fops must provide b3_mul (scaling by 3*b of the
    curve). Returns (X3, Y3, Z3). 12 muls, no branches.
    """
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    mul, add, sub = fops.mul, fops.add, fops.sub

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = add(X1, Y1)
    t4 = add(X2, Y2)
    t3 = mul(t3, t4)
    t4 = add(t0, t1)
    t3 = sub(t3, t4)
    t4 = add(Y1, Z1)
    X3 = add(Y2, Z2)
    t4 = mul(t4, X3)
    X3 = add(t1, t2)
    t4 = sub(t4, X3)
    X3 = add(X1, Z1)
    Y3 = add(X2, Z2)
    X3 = mul(X3, Y3)
    Y3 = add(t0, t2)
    Y3 = sub(X3, Y3)
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = fops.b3_mul(t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = fops.b3_mul(Y3)
    X3 = mul(t4, Y3)
    t2 = mul(t3, t1)
    X3 = sub(t2, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = add(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = add(Z3, t0)
    return (X3, Y3, Z3)


class G1Ops(FqOps):
    """G1: y^2 = x^3 + 4; b3 = 12 (plain int scaling)."""

    @staticmethod
    def b3_mul(a):
        return _mul_small(FqOps, a, 12)


class G2Ops(Fq2Ops):
    """G2 twist: y^2 = x^3 + 4(u+1); b3 = 12(u+1) = (12, 12)."""

    @staticmethod
    def b3_mul(a):
        t = _mul_small(Fq2Ops, a, 12)  # (12c0, 12c1)
        # multiply by (1 + u): (c0 - c1) + (c0 + c1) u applied AFTER scaling
        c0, c1 = t[..., 0, :], t[..., 1, :]
        return jnp.stack([F.sub(FQ, c0, c1), F.add(FQ, c0, c1)], axis=-2)


def g_add(fops, p, q):
    from masp_tpu.ops import field_jax as _F

    if hasattr(fops, "add_points"):  # curve brings its own complete formula
        return fops.add_points(p, q)
    if _F.get_impl() == "pallas" and fops in (G1Ops, G2Ops):
        from masp_tpu.kernels.field_kernels import pallas_point_add

        kind = "g1" if fops is G1Ops else "g2"
        cshape = fops.coord_shape
        nb = len(cshape)
        shapes = [c.shape[:-nb] for c in (*p, *q)]
        batch_shape = shapes[0]
        for sh in shapes:
            batch_shape = jnp.broadcast_shapes(batch_shape, sh)

        def flat(c):
            c = jnp.broadcast_to(c, batch_shape + cshape)
            return c.reshape((-1,) + cshape)

        out = pallas_point_add(kind, tuple(map(flat, p)), tuple(map(flat, q)), cshape)
        return tuple(o.reshape(batch_shape + cshape) for o in out)
    return point_add(fops, p, q)


def g_add01(fops, p, q):
    """g_add for operands whose Z coordinates are 0 or (Montgomery) 1 —
    the MSM ladder's leaf level, where every input is an encoded affine
    parameter point or an identity pad. On the pallas path this uses the
    specialized 9-mul kernel; elsewhere the general complete formula (for
    which the precondition is simply irrelevant)."""
    from masp_tpu.ops import field_jax as _F

    if (
        _F.get_impl() == "pallas"
        and fops in (G1Ops, G2Ops)
        and not hasattr(fops, "add_points")
    ):
        from masp_tpu.kernels.field_kernels import pallas_point_add01

        kind = "g1" if fops is G1Ops else "g2"
        cshape = fops.coord_shape
        nb = len(cshape)
        shapes = [c.shape[:-nb] for c in (*p, *q)]
        batch_shape = shapes[0]
        for sh in shapes:
            batch_shape = jnp.broadcast_shapes(batch_shape, sh)

        def flat(c):
            c = jnp.broadcast_to(c, batch_shape + cshape)
            return c.reshape((-1,) + cshape)

        out = pallas_point_add01(
            kind, tuple(map(flat, p)), tuple(map(flat, q)), cshape
        )
        return tuple(o.reshape(batch_shape + cshape) for o in out)
    return g_add(fops, p, q)


def g_double(fops, p):
    return point_add(fops, p, p)


def identity_like(fops, x_coord):
    """Identity (0 : 1 : 0) with coordinate batch shape taken from x_coord."""
    zero = fops.zeros_like(x_coord)
    one = fops.one_like(x_coord)
    return (zero, one, zero)


def point_select(cond, p, q):
    """cond ? p : q, applied per batch element to all coordinates."""
    def sel(a, b):
        c = cond.reshape(cond.shape + (1,) * (a.ndim - cond.ndim))
        return jnp.where(c != 0, a, b)

    return tuple(sel(a, b) for a, b in zip(p, q))


def to_affine(fops, p):
    """Projective -> affine via batch inversion; identity maps to (0, 0)."""
    X, Y, Z = p
    zinv = fops.batch_inv(Z)
    return fops.mul(X, zinv), fops.mul(Y, zinv)


# --- host codecs -----------------------------------------------------------

def encode_g1_points(points) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host G1 affine points -> projective limb arrays (identity -> (0,1,0))."""
    xs, ys, zs = [], [], []
    for p in points:
        if p.is_identity():
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(p.x.n)
            ys.append(p.y.n)
            zs.append(1)
    return FqOps.encode(xs), FqOps.encode(ys), FqOps.encode(zs)


def decode_g1_points(X, Y, Z):
    """Projective limb arrays -> host G1 list."""
    from masp_tpu.curves.bls12_381 import G1, _FqElt

    xs = FqOps.decode(X)
    ys = FqOps.decode(Y)
    zs = FqOps.decode(Z)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(G1.identity())
        else:
            zi = pow(z, -1, Q)
            out.append(G1.from_xy(_FqElt(x * zi % Q), _FqElt(y * zi % Q)))
    return out


def encode_g2_points(points) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    xs, ys, zs = [], [], []
    for p in points:
        if p.is_identity():
            xs.append((0, 0))
            ys.append((1, 0))
            zs.append((0, 0))
        else:
            xs.append((p.x.c0, p.x.c1))
            ys.append((p.y.c0, p.y.c1))
            zs.append((1, 0))
    return Fq2Ops.encode(xs), Fq2Ops.encode(ys), Fq2Ops.encode(zs)


def decode_g2_points(X, Y, Z):
    from masp_tpu.curves.bls12_381 import G2, Fq2

    xs = Fq2Ops.decode(X)
    ys = Fq2Ops.decode(Y)
    zs = Fq2Ops.decode(Z)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == (0, 0):
            out.append(G2.identity())
        else:
            zi = Fq2(z[0], z[1]).invert()
            out.append(
                G2.from_xy(Fq2(x[0], x[1]) * zi, Fq2(y[0], y[1]) * zi)
            )
    return out


__all__ = [
    "FqOps", "Fq2Ops", "G1Ops", "G2Ops", "point_add", "g_add", "g_double",
    "identity_like", "point_select", "to_affine",
    "encode_g1_points", "decode_g1_points", "encode_g2_points",
    "decode_g2_points",
]

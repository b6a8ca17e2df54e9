"""Batched Jubjub on device: complete Edwards ops, MSM, decompression.

Device counterpart of curves/jubjub.py (reference: nam-jubjub crate,
SURVEY.md §2.4). TPU-native design:

* Points in PROJECTIVE twisted-Edwards coordinates (X : Y : Z) over Fr
  (the BLS12-381 scalar field — Jubjub's base field; 16x16-bit limb
  arrays, masp_tpu.ops.field_jax FR spec). Addition uses the
  add-2008-bbjlp unified formula, which is COMPLETE for Jubjub
  (a = −1 is a square in Fr since 2^32 | r−1, d is a non-square), so
  there is no branch anywhere: identity, doubling and mixed cases all
  take the same 11-mul kernel. The identity is (0 : 1 : 1).
* MSM reuses the sorted-prefix Pippenger engine (ops/msm_sorted.py)
  verbatim — JubjubOps plugs into the same fops interface as G1/G2 via
  the add_points/neg_point/IDENTITY_MONT hooks. This is the "RedJubjub
  batch as one Jubjub MSM" row of SURVEY.md §7 Phase 6.
* Batched point decompression (``batch_from_bytes``) for the wallet
  trial-decryption hot loop (reference jubjub ExtendedPoint::
  batch_from_bytes, note_encryption.rs:385-400): the square root runs
  as ONE batched constant-time Tonelli-Shanks (the ff crate's
  sqrt_tonelli_shanks schedule, S = 32) over all candidates; sign/
  canonicality fix-ups are host-side byte logic.
* ``batch_verify_device`` — RedJubjub randomized batch verification
  (redjubjub.rs:240-275 semantics) with the accumulated linear
  combination evaluated as one device MSM.

Everything is exact vs the host implementations (tests/test_jubjub_jax.py).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from masp_tpu.curves.jubjub import EDWARDS_D, ExtendedPoint
from masp_tpu.fields import SCALAR_MODULUS, JubjubFr, Scalar
from masp_tpu.ops import field_jax as F
from masp_tpu.ops.field_jax import FR

_R = SCALAR_MODULUS


def _fr_const(n: int) -> np.ndarray:
    return np.asarray(F.encode(FR, [n % _R])[0])


D_MONT = _fr_const(EDWARDS_D.n)
_ONE_MONT = np.asarray(FR.ONE_MONT, dtype=np.uint32)
_ZERO = np.zeros(FR.L, dtype=np.uint32)


class JubjubOps:
    """fops-interface curve ops for Jubjub (cf. weierstrass_jax.FqOps).

    Plugs into ops/msm.py + ops/msm_sorted.py through three hooks the
    generic engine checks for: ``add_points`` (complete addition — used
    instead of the Weierstrass formulas), ``neg_point`` (Edwards negation
    flips X, not Y) and ``IDENTITY_MONT`` (the Edwards identity is
    (0 : 1 : 1), not (0 : 1 : 0))."""

    spec = FR
    coord_shape = (FR.L,)
    IDENTITY_MONT = (_ZERO, _ONE_MONT, _ONE_MONT)

    @staticmethod
    def mul(a, b):
        return F.mont_mul(FR, a, b)

    @staticmethod
    def add(a, b):
        return F.add(FR, a, b)

    @staticmethod
    def sub(a, b):
        return F.sub(FR, a, b)

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def one_like(a):
        return jnp.broadcast_to(jnp.asarray(_ONE_MONT), a.shape)

    @staticmethod
    def inv(a):
        return F.mont_inv(FR, a)

    @staticmethod
    def batch_inv(a):
        return F.batch_mont_inv(FR, a)

    @staticmethod
    def encode(vals):
        return F.encode(FR, vals)

    @staticmethod
    def decode(arr):
        return F.decode(FR, arr)

    @staticmethod
    def add_points(p, q):
        """add-2008-bbjlp with a = −1 (so D − aC = D + C); complete."""
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        mul, add, sub = JubjubOps.mul, JubjubOps.add, JubjubOps.sub
        A = mul(Z1, Z2)
        B = mul(A, A)
        C = mul(X1, X2)
        D = mul(Y1, Y2)
        E = mul(jnp.asarray(D_MONT), mul(C, D))
        Fv = sub(B, E)
        G = add(B, E)
        H = sub(mul(add(X1, Y1), add(X2, Y2)), add(C, D))
        X3 = mul(mul(A, Fv), H)
        Y3 = mul(mul(A, G), add(D, C))
        Z3 = mul(Fv, G)
        return X3, Y3, Z3

    @staticmethod
    def neg_point(p):
        X, Y, Z = p
        return F.neg(FR, X), Y, Z


# ---------------------------------------------------------------------------
# host <-> device codecs

def encode_points(points) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host ExtendedPoints -> (X, Y, Z=1) Montgomery limb arrays. The
    identity's affine form (0, 1) IS the projective identity, so no
    special-casing."""
    aff = [p.to_affine() for p in points]
    X = F.encode(FR, [u.n for u, _ in aff])
    Y = F.encode(FR, [v.n for _, v in aff])
    Z = F.encode(FR, [1] * len(points))
    return X, Y, Z


def decode_points(X, Y, Z) -> list[ExtendedPoint]:
    xs = F.decode(FR, np.asarray(X))
    ys = F.decode(FR, np.asarray(Y))
    zs = F.decode(FR, np.asarray(Z))
    out = []
    for x, y, z in zip(xs, ys, zs):
        zi = pow(z, -1, _R)  # Z never 0 under complete addition
        out.append(ExtendedPoint.from_affine(Scalar(x * zi % _R), Scalar(y * zi % _R)))
    return out


def decode_point(coords) -> ExtendedPoint:
    return decode_points(*(np.asarray(c)[None] for c in coords))[0]


# ---------------------------------------------------------------------------
# MSM

def msm(points: list[ExtendedPoint], scalars: list[int | JubjubFr],
        c: int = 8) -> ExtendedPoint:
    """sum_i [s_i] P_i on device via the sorted-prefix Pippenger engine."""
    from masp_tpu.ops import msm as M
    from masp_tpu.ops import msm_sorted as MS

    ints = [s.n if isinstance(s, JubjubFr) else int(s) for s in scalars]
    if len(points) != len(ints):
        raise ValueError("points/scalars length mismatch")
    if not points:
        return ExtendedPoint.identity()
    n = 1 << max(0, (len(points) - 1)).bit_length() if len(points) > 1 else 1
    pts = list(points) + [ExtendedPoint.identity()] * (n - len(points))
    ints = ints + [0] * (n - len(ints))
    packed = MS.pack_points(tuple(jnp.asarray(x) for x in encode_points(pts)))
    digits = jnp.asarray(M.scalars_to_digits(ints, c, 256))
    return decode_point(MS.sorted_msm(JubjubOps, packed, digits, c))


# ---------------------------------------------------------------------------
# batched sqrt (constant-time Tonelli-Shanks, S = 32) + decompression

_S = 32
_T_ODD = (_R - 1) >> _S  # odd cofactor: r - 1 = 2^32 * t
assert _T_ODD & 1 == 1


@lru_cache(maxsize=None)
def _root_of_unity() -> int:
    g = 2
    while pow(g, (_R - 1) // 2, _R) != _R - 1:
        g += 1
    return pow(g, _T_ODD, _R)


def _bits_msb(n: int) -> np.ndarray:
    return np.array([int(b) for b in bin(n)[2:]], dtype=np.uint32)


def _is_one(a):
    return jnp.all(a == jnp.asarray(_ONE_MONT), axis=-1)


@lru_cache(maxsize=None)
def _sqrt_schedule() -> tuple[np.ndarray, np.ndarray]:
    """Static (is_boundary, j) step stream flattening the ff crate's
    doubly-nested constant-time Tonelli-Shanks loops: for every
    max_v = S..1, the inner j = 2..max_v steps, then one outer-boundary
    step. One uniform scan body -> one small compiled program (the
    unrolled form was ~500 inlined field ops and minutes of XLA time)."""
    is_b, js = [], []
    for max_v in range(_S, 0, -1):
        for j in range(2, max_v):
            is_b.append(0)
            js.append(j)
        is_b.append(1)
        js.append(0)
    return np.asarray(is_b, dtype=np.int32), np.asarray(js, dtype=np.int32)


def batch_sqrt(a):
    """Batched sqrt over Fr: a (N, L) Montgomery -> (root, is_square).

    The ff crate's constant-time Tonelli-Shanks schedule (S = 32,
    data-independent iteration count — so one traced graph serves every
    batch), run as a single lax.scan over the flattened step stream.
    Returns SOME root when one exists (callers that need a specific sign
    fix it from the canonical parity, as from_bytes does); root = 0 for
    a = 0."""
    import jax

    one = jnp.broadcast_to(jnp.asarray(_ONE_MONT), a.shape)
    w = F.mont_pow_fixed(FR, a, jnp.asarray(_bits_msb((_T_ODD - 1) // 2)))
    v = jnp.full(a.shape[:-1], _S, dtype=jnp.int32)
    x = F.mont_mul(FR, a, w)
    b = F.mont_mul(FR, x, w)
    z = jnp.broadcast_to(jnp.asarray(_fr_const(_root_of_unity())), a.shape)
    k = jnp.ones_like(v)
    tmp = F.mont_sqr(FR, b)
    jltv = jnp.ones(a.shape[:-1], dtype=bool)

    def step(carry, inp):
        x, b, z, v, k, tmp, jltv = carry
        is_boundary, j = inp

        # inner step (j in 2..max_v)
        tmp_is_one = _is_one(tmp)
        squared = F.mont_sqr(FR, F.select(tmp_is_one, z, tmp))
        tmp_i = F.select(tmp_is_one, tmp, squared)
        new_z = F.select(tmp_is_one, squared, z)
        jltv_i = jnp.logical_and(jltv, j != v)
        k_i = jnp.where(tmp_is_one, k, j)
        z_i = F.select(jltv_i, new_z, z)

        # outer boundary (after the inner run): x/z/b/v updates, then the
        # next iteration's re-initialization of k/tmp/jltv
        b_is_one = _is_one(b)
        x_b = F.select(b_is_one, x, F.mont_mul(FR, x, z))
        z_b = F.mont_sqr(FR, z)
        b_b = F.mont_mul(FR, b, z_b)
        v_b = k
        k_b = jnp.ones_like(k)
        tmp_b = F.mont_sqr(FR, b_b)
        jltv_b = jnp.ones_like(jltv)

        m = is_boundary != 0  # scalar per step, broadcasts over the batch
        x = jnp.where(m, x_b, x)
        b = jnp.where(m, b_b, b)
        z = jnp.where(m, z_b, z_i)
        v = jnp.where(m, v_b, v)
        k = jnp.where(m, k_b, k_i)
        tmp = jnp.where(m, tmp_b, tmp_i)
        jltv = jnp.where(m, jltv_b, jltv_i)
        return (x, b, z, v, k, tmp, jltv), None

    sched = tuple(jnp.asarray(s) for s in _sqrt_schedule())
    (x, *_rest), _ = jax.lax.scan(step, (x, b, z, v, k, tmp, jltv), sched)
    ok = jnp.all(F.mont_sqr(FR, x) == a, axis=-1)
    return x, ok


def batch_from_bytes(items: list[bytes],
                     zip_216_enabled: bool = True) -> list[ExtendedPoint | None]:
    """Vectorized ExtendedPoint.from_bytes: ONE batched device program for
    the v² / (1 + d·v²) inversion and the sqrt; byte parsing, sign flip
    and canonicality rejection are host logic identical to
    curves/jubjub.py from_bytes_inner."""
    vs, signs, valid = [], [], []
    for b in items:
        if len(b) != 32:
            vs.append(0), signs.append(0), valid.append(False)
            continue
        sign = b[31] >> 7
        v_int = int.from_bytes(b[:31] + bytes([b[31] & 0x7F]), "little")
        ok = v_int < _R
        vs.append(v_int if ok else 0)
        signs.append(sign)
        valid.append(ok)
    if not items:
        return []

    v_m = jnp.asarray(F.encode(FR, vs))
    one = jnp.broadcast_to(jnp.asarray(_ONE_MONT), v_m.shape)
    v2 = F.mont_sqr(FR, v_m)
    denom = F.add(FR, one, F.mont_mul(FR, jnp.asarray(D_MONT), v2))
    u2 = F.mont_mul(FR, F.sub(FR, v2, one), F.batch_mont_inv(FR, denom))
    u_m, ok_dev = batch_sqrt(u2)

    us = F.decode(FR, np.asarray(u_m))
    oks = np.asarray(ok_dev)
    out: list[ExtendedPoint | None] = []
    for u, is_sq, v_int, sign, ok in zip(us, oks, vs, signs, valid):
        if not (ok and is_sq):
            out.append(None)
            continue
        flip = ((u & 1) ^ sign) == 1
        if zip_216_enabled and u == 0 and flip:
            out.append(None)  # non-canonical -0 encoding
            continue
        final_u = (_R - u) % _R if flip else u
        out.append(ExtendedPoint.from_affine(Scalar(final_u), Scalar(v_int)))
    return out


# ---------------------------------------------------------------------------
# RedJubjub batch verification as one device MSM

def batch_verify_device(rng, batch, p_g: ExtendedPoint) -> bool:
    """Randomized batch verification, redjubjub.rs:240-275 semantics:
    h_G(sum_i z_i·R_i + (c_i z_i)·vk_i  −  (sum_i s_i z_i)·P_G) == 0.

    Signature R points are decoded with the batched device decompression;
    the linear combination is one device MSM over 2B+1 points."""
    from masp_tpu.primitives.redjubjub import h_star

    if not batch:
        return True
    rs = batch_from_bytes([e.sig.rbar for e in batch])
    points: list[ExtendedPoint] = []
    scalars: list[int] = []
    pg_scalar = 0
    q = JubjubFr.META.modulus
    for entry, r in zip(batch, rs):
        if r is None:
            return False
        s = JubjubFr.from_bytes(entry.sig.sbar)
        if s is None:
            return False
        c = h_star(entry.sig.rbar, entry.msg)
        z = JubjubFr.from_bytes_wide(rng.fill_bytes(64))
        points.append(r)
        scalars.append(z.n)
        points.append(entry.vk.point)
        scalars.append(c.n * z.n % q)
        pg_scalar = (pg_scalar - s.n * z.n) % q
    points.append(p_g)
    scalars.append(pg_scalar)
    return msm(points, scalars).mul_by_cofactor().is_identity()


__all__ = [
    "JubjubOps", "encode_points", "decode_points", "decode_point", "msm",
    "batch_sqrt", "batch_from_bytes", "batch_verify_device",
]

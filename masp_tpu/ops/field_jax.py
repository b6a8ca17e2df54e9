"""Batched modular arithmetic on TPU: 16-bit-limb Montgomery kernels in JAX.

This is the L0 replacement for ``nam-blst``'s C/assembly field ops
(SURVEY.md §2.4): everything is uint32 lane arithmetic with static shapes,
so XLA vectorizes it onto the VPU and fuses entire curve formulas into a
few kernels.  All values are kept in Montgomery form (R = 2^(16*L)); codecs
at the boundary convert to/from canonical integers.

Layout: an element is an array (..., L) of uint32 limbs, each < 2^16.
  * limb products fit uint32 exactly (16x16 -> 32)
  * column accumulations stay < 2^24 (lazy carries), well inside uint32
  * the schoolbook column sums are one einsum against a constant 0/1
    spread tensor (keeps the XLA graph tiny; contraction maps to dot)
  * CIOS Montgomery reduction runs as L unrolled vector steps

Fields provided: FR (BLS12-381 scalar, L=16) and FQ (BLS12-381 base, L=24).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from masp_tpu.fields import FQ_MODULUS, SCALAR_MODULUS
from masp_tpu.ops.limbs import LIMB_BITS, LIMB_MASK, int_to_limbs

U32 = jnp.uint32
I32 = jnp.int32


class FieldSpec:
    """Static per-field constants for the limb kernels."""

    def __init__(self, name: str, modulus: int, n_limbs: int):
        self.name = name
        self.modulus = modulus
        self.L = n_limbs
        self.bits = n_limbs * LIMB_BITS
        self.R = 1 << self.bits
        assert self.R > modulus
        self.R_mod = self.R % modulus
        self.R2_mod = (self.R * self.R) % modulus
        # -N^{-1} mod 2^16
        self.n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.N = np.asarray(int_to_limbs(modulus, n_limbs))
        self.N_jax = jnp.asarray(self.N, dtype=U32)
        self.ONE_MONT = np.asarray(int_to_limbs(self.R_mod, n_limbs))
        self.R2_MONT = np.asarray(int_to_limbs(self.R2_mod, n_limbs))
        self.ZERO = np.zeros(n_limbs, dtype=np.uint32)
        # exponent bits (MSB first) for Fermat inversion
        e = modulus - 2
        self.inv_exp_bits = np.array(
            [(e >> i) & 1 for i in range(e.bit_length() - 1, -1, -1)],
            dtype=np.uint32,
        )
        # base-16 digits (MSB first) of N-2, for the 4-bit-window Fermat
        # chain in mont_inv_small
        nnib = -(-e.bit_length() // 4)
        self.inv_exp_nibbles = np.array(
            [(e >> (4 * i)) & 0xF for i in range(nnib - 1, -1, -1)],
            dtype=np.int32,
        )


FR = FieldSpec("Fr", SCALAR_MODULUS, 16)
FQ = FieldSpec("Fq", FQ_MODULUS, 24)


@lru_cache(maxsize=None)
def _spread_tensors(L: int):
    """Constant 0/1 tensors: lo (i,j)->col i+j and hi (i,j)->col i+j+1."""
    Slo = np.zeros((L, L, 2 * L + 1), np.int32)
    Shi = np.zeros((L, L, 2 * L + 1), np.int32)
    for i in range(L):
        for j in range(L):
            Slo[i, j, i + j] = 1
            Shi[i, j, i + j + 1] = 1
    # keep as numpy: caching jnp arrays created inside a trace leaks tracers
    return Slo, Shi


def _wide_product_cols(L: int, a, b):
    """(..., 2L+1) lazy columns of the schoolbook product (< 2^22 each)."""
    p = a[..., :, None] * b[..., None, :]  # (..., L, L) uint32, exact
    lo = (p & LIMB_MASK).astype(I32)
    hi = (p >> LIMB_BITS).astype(I32)
    Slo, Shi = _spread_tensors(L)
    cols = jnp.einsum(
        "...ij,ijk->...k", lo, Slo, preferred_element_type=I32
    ) + jnp.einsum("...ij,ijk->...k", hi, Shi, preferred_element_type=I32)
    return cols.astype(U32)


def _carry_reduce(spec: FieldSpec, t):
    """Full carry propagation of L lazy limbs (< 2^24 each, total value
    < 2*N) followed by one conditional subtract of N."""
    L = spec.L
    limbs = []
    c = jnp.zeros_like(t[..., 0])
    for i in range(L):
        v = t[..., i] + c
        limbs.append(v & LIMB_MASK)
        c = v >> LIMB_BITS
    out = jnp.stack(limbs, axis=-1)
    # subtract N with borrow; select based on overflow carry c or no-borrow
    diff_limbs = []
    borrow = jnp.zeros_like(c, dtype=I32)
    for i in range(L):
        v = out[..., i].astype(I32) - spec.N_jax[i].astype(I32) - borrow
        diff_limbs.append((v & LIMB_MASK).astype(U32))
        borrow = (v < 0).astype(I32)
    diff = jnp.stack(diff_limbs, axis=-1)
    # value >= N  iff  c == 1 or borrow == 0
    ge = jnp.logical_or(c > 0, borrow == 0)
    return jnp.where(ge[..., None], diff, out)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product: a*b*R^{-1} mod N. a, b: (..., L) uint32 limbs."""
    if _IMPL == "compact":
        return _mont_mul_compact(spec, a, b)
    if _IMPL == "pallas":
        from masp_tpu.kernels.field_kernels import pallas_mont_mul

        return pallas_mont_mul(spec, a, b)
    L = spec.L
    n0inv = jnp.uint32(spec.n0inv)
    N = spec.N_jax

    t = _wide_product_cols(L, a, b)  # (..., 2L+1)

    # CIOS: L reduction steps, consuming one low limb each
    for _ in range(L):
        m = (t[..., 0] * n0inv) & LIMB_MASK
        mn = m[..., None] * N  # (..., L) < 2^32
        mlo = mn & LIMB_MASK
        mhi = mn >> LIMB_BITS
        t = t.at[..., :L].add(mlo)
        t = t.at[..., 1 : L + 1].add(mhi)
        t = t.at[..., 1].add(t[..., 0] >> LIMB_BITS)
        t = t[..., 1:]

    return _carry_reduce(spec, t[..., :L])


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def add(spec: FieldSpec, a, b):
    if _IMPL == "compact":
        return _carry_reduce_compact(spec, a + b)
    return _carry_reduce(spec, a + b)  # limbs < 2^17


def sub(spec: FieldSpec, a, b):
    if _IMPL == "compact":
        return _sub_compact(spec, a, b)
    # a + N - b in [1, 2N): per-limb signed diff with carry in {-1, 0, 1}
    L = spec.L
    limbs = []
    carry = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), dtype=I32)
    for i in range(L):
        v = (
            a[..., i].astype(I32)
            + spec.N_jax[i].astype(I32)
            - b[..., i].astype(I32)
            + carry
        )
        limbs.append((v & LIMB_MASK).astype(U32))
        carry = v >> LIMB_BITS  # arithmetic shift
    t = jnp.stack(limbs, axis=-1)
    return _carry_reduce(spec, t)


def neg(spec: FieldSpec, a):
    return sub(spec, jnp.zeros_like(a), a)


def select(cond, a, b):
    """cond ? a : b (cond: (...,) bool/int broadcast against limb axis)."""
    return jnp.where(cond[..., None] != 0, a, b)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def mont_pow_fixed(spec: FieldSpec, a, exp_bits):
    """a^e in Montgomery form, e as MSB-first bit array; lax.scan keeps the
    graph small."""
    one = jnp.broadcast_to(jnp.asarray(spec.ONE_MONT, dtype=U32), a.shape)

    def body(acc, bit):
        acc = mont_sqr(spec, acc)
        mult = mont_mul(spec, acc, a)
        acc = select(jnp.broadcast_to(bit, acc.shape[:-1]), mult, acc)
        return acc, None

    out, _ = jax.lax.scan(body, one, exp_bits)
    return out


def mont_inv(spec: FieldSpec, a):
    """Fermat inversion a^{N-2} (Montgomery in, Montgomery out)."""
    return mont_pow_fixed(spec, a, jnp.asarray(spec.inv_exp_bits))


def _mont_mul_unrolled(spec: FieldSpec, a, b):
    """The fully-unrolled CIOS multiplier, independent of the active impl.
    At tiny batch widths (the batch-affine MSM ladder's width-1 product-
    tree roots) the pallas kernel pays a call per mul (~7 us/step) and the
    compact scans pay per-iteration overhead; the unrolled graph fuses."""
    L = spec.L
    n0inv = jnp.uint32(spec.n0inv)
    N = spec.N_jax
    t = _wide_product_cols(L, a, b)
    for _ in range(L):
        m = (t[..., 0] * n0inv) & LIMB_MASK
        mn = m[..., None] * N
        mlo = mn & LIMB_MASK
        mhi = mn >> LIMB_BITS
        t = t.at[..., :L].add(mlo)
        t = t.at[..., 1 : L + 1].add(mhi)
        t = t.at[..., 1].add(t[..., 0] >> LIMB_BITS)
        t = t[..., 1:]
    return _carry_reduce(spec, t[..., :L])


def mont_inv_small(spec: FieldSpec, a):
    """Fermat inversion tuned for TINY batch widths — the once-per-ladder-
    level root inverse of the batch-affine MSM's product tree. Walks the
    exponent in 4-bit fixed windows: ceil(bits/4) iterations of 4
    squarings + 1 table mul instead of bits x (square, mul, select) steps
    — ~475 dependent muls instead of ~762. Uses the active impl's
    multiplier (the pallas kernel's per-call cost at width 1 is ~3 us;
    the unrolled XLA graph measured ~30x worse per op). Bit-identical to
    mont_inv."""
    mul = partial(mont_mul, spec)
    one = jnp.broadcast_to(jnp.asarray(spec.ONE_MONT, dtype=U32), a.shape)
    pows = [one, a]
    for _j in range(2, 16):
        pows.append(mul(pows[-1], a))
    table = jnp.stack(pows)  # (16, ..., L)
    nibs = spec.inv_exp_nibbles

    def body(acc, nib):
        for _ in range(4):
            acc = mul(acc, acc)
        return mul(acc, jnp.take(table, nib, axis=0)), None

    acc0 = jnp.take(table, jnp.asarray(nibs[0]), axis=0)
    acc, _ = jax.lax.scan(body, acc0, jnp.asarray(nibs[1:]))
    return acc


def batch_mont_inv(spec: FieldSpec, a):
    """Batch inversion over the leading axis: Hillis-Steele prefix products
    (log2(n) full-array mul steps) + one Fermat inversion + unwind."""
    n = a.shape[0]
    one_el = jnp.asarray(spec.ONE_MONT, dtype=U32)
    one = jnp.broadcast_to(one_el, a.shape)
    zero = jnp.zeros_like(a)
    iz = is_zero(a)
    safe = jnp.where(iz[..., None], one, a)

    # prefix[i] = prod_{j<=i} safe[j], via log-step doubling
    steps = max(1, (n - 1).bit_length())

    def prefix_body(k, p):
        shift = jnp.left_shift(jnp.int32(1), k)
        rolled = jnp.roll(p, shift, axis=0)
        mask = (jnp.arange(n) >= shift).reshape((n,) + (1,) * (p.ndim - 1))
        shifted = jnp.where(mask, rolled, one)
        return mont_mul(spec, p, shifted)

    prefix = jax.lax.fori_loop(0, steps, prefix_body, safe)

    total_inv = mont_inv(spec, prefix[-1])

    # inv(safe[i]) = total-suffix trick: suffix[i] = prod_{j>=i} safe[j]
    # inverse; compute with reversed prefix of reversed array:
    rev = safe[::-1]
    rev_prefix = jax.lax.fori_loop(0, steps, prefix_body, rev)
    suffix = rev_prefix[::-1]  # suffix[i] = prod_{j>=i} safe[j]
    # inv(safe[i]) = prefix[i-1] * suffix[i+1] * inv(total)
    pfx_prev = jnp.concatenate([one[:1], prefix[:-1]], axis=0)
    sfx_next = jnp.concatenate([suffix[1:], one[:1]], axis=0)
    invs = mont_mul(spec, mont_mul(spec, pfx_prev, sfx_next), total_inv)
    return jnp.where(iz[..., None], zero, invs)


def to_mont(spec: FieldSpec, a):
    return mont_mul(spec, a, jnp.asarray(spec.R2_MONT, dtype=U32))


def from_mont(spec: FieldSpec, a):
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(spec, a, one)


# --- host codecs -----------------------------------------------------------

def encode(spec: FieldSpec, xs: list[int], mont: bool = True) -> np.ndarray:
    """ints -> (N, L) uint32 (Montgomery by default)."""
    from masp_tpu.ops.limbs import ints_to_limbs

    if mont:
        xs = [(x % spec.modulus) * spec.R_mod % spec.modulus for x in xs]
    else:
        xs = [x % spec.modulus for x in xs]
    return ints_to_limbs(xs, spec.L)


def decode(spec: FieldSpec, arr, mont: bool = True) -> list[int]:
    from masp_tpu.ops.limbs import limbs_to_ints

    vals = limbs_to_ints(np.asarray(arr))
    if mont:
        rinv = pow(spec.R_mod, -1, spec.modulus)
        vals = [v * rinv % spec.modulus for v in vals]
    return vals




# ---------------------------------------------------------------------------
# Compact (scan-based) implementations: ~30 ops per mul instead of ~600, for
# places where XLA compile time matters more than runtime (CPU tests, the
# multi-chip dry-run). Selected via set_impl("compact").

_IMPL = "unrolled"


def set_impl(name: str):
    """"unrolled" (default, fastest runtime) or "compact" (smallest graphs)."""
    global _IMPL
    assert name in ("unrolled", "compact", "pallas")
    _IMPL = name


def get_impl() -> str:
    return _IMPL


def _carry_reduce_compact(spec: FieldSpec, t):
    """Scan-based carry propagation + conditional subtract; t: (..., L)."""
    L = spec.L
    tm = jnp.moveaxis(t, -1, 0)  # (L, ...)

    def carry_body(c, ti):
        v = ti + c
        return v >> LIMB_BITS, v & LIMB_MASK

    c, limbs = jax.lax.scan(carry_body, jnp.zeros_like(tm[0]), tm)
    Nm = jnp.moveaxis(
        jnp.broadcast_to(spec.N_jax, limbs.shape[1:] + (L,)), -1, 0
    ).astype(jnp.int32)

    def sub_body(borrow, xs):
        li, ni = xs
        v = li.astype(jnp.int32) - ni - borrow
        return (v < 0).astype(jnp.int32), (v & LIMB_MASK).astype(U32)

    borrow, diff = jax.lax.scan(
        sub_body, jnp.zeros_like(c, dtype=jnp.int32), (limbs, Nm)
    )
    ge = jnp.logical_or(c > 0, borrow == 0)
    out = jnp.where(ge[None], diff, limbs)
    return jnp.moveaxis(out, 0, -1)


def _mont_mul_compact(spec: FieldSpec, a, b):
    L = spec.L
    n0inv = jnp.uint32(spec.n0inv)
    N = spec.N_jax
    t = _wide_product_cols(L, a, b)  # (..., 2L+1)
    W = 2 * L + 1

    def cios_body(_k, t):
        m = (t[..., 0] * n0inv) & LIMB_MASK
        mn = m[..., None] * N  # (..., L)
        mlo = mn & LIMB_MASK
        mhi = mn >> LIMB_BITS
        pad_cfg_lo = [(0, 0)] * (t.ndim - 1) + [(0, W - L)]
        pad_cfg_hi = [(0, 0)] * (t.ndim - 1) + [(1, W - L - 1)]
        t = t + jnp.pad(mlo, pad_cfg_lo) + jnp.pad(mhi, pad_cfg_hi)
        # drop the (now zero mod 2^16) limb 0, folding its carry into the
        # next limb — slice+concat, no scatters (scatters inside the
        # fori body made XLA:CPU lowering/compile pathological)
        head = t[..., 1:2] + (t[..., 0:1] >> LIMB_BITS)
        return jnp.concatenate(
            [head, t[..., 2:], jnp.zeros_like(t[..., 0:1])], axis=-1
        )

    t = jax.lax.fori_loop(0, L, cios_body, t)
    return _carry_reduce_compact(spec, t[..., :L])


def _sub_compact(spec: FieldSpec, a, b):
    L = spec.L
    am = jnp.moveaxis(a, -1, 0).astype(jnp.int32)
    bm = jnp.moveaxis(b, -1, 0).astype(jnp.int32)
    Nm = jnp.moveaxis(
        jnp.broadcast_to(spec.N_jax, am.shape[1:] + (L,)), -1, 0
    ).astype(jnp.int32)

    def body(carry, xs):
        ai, bi, ni = xs
        v = ai + ni - bi + carry
        return v >> LIMB_BITS, (v & LIMB_MASK).astype(U32)

    bshape = jnp.broadcast_shapes(am.shape[1:], bm.shape[1:])
    am = jnp.broadcast_to(am, (L,) + bshape)
    bm = jnp.broadcast_to(bm, (L,) + bshape)
    _c, limbs = jax.lax.scan(
        body, jnp.zeros(bshape, dtype=jnp.int32), (am, bm, Nm)
    )
    return _carry_reduce_compact(spec, jnp.moveaxis(limbs, 0, -1))


__all__ = [
    "FieldSpec", "FR", "FQ", "mont_mul", "mont_sqr", "add", "sub", "neg",
    "select", "is_zero", "mont_pow_fixed", "mont_inv", "mont_inv_small",
    "batch_mont_inv",
    "to_mont", "from_mont", "encode", "decode", "set_impl", "get_impl",
]

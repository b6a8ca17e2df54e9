"""Pallas TPU kernels for limb field arithmetic and fused curve ops.

Why: the pure-XLA limb graphs (ops/field_jax.py) are correct but each field
mul unrolls to ~600 HLO ops, so composite programs (MSM loops) take minutes
to lower/compile. Here the same arithmetic is a single Mosaic kernel: the
XLA graph sees one custom call per point-add, lowering collapses ~100x, and
limbs stay in VMEM across the entire curve formula (no materialized
intermediates).

Layout: kernels work limb-major — an element batch is (B1, L, 128) uint32
(batch split into 128-lane groups, limbs on sublanes). Wrappers convert from
the (B, L) layout the rest of ops/ uses.

Falls back to interpret mode off-TPU (CPU tests / virtual meshes).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from masp_tpu.ops.field_jax import FQ, FR, FieldSpec

LANE = 128
MASK = 0xFFFF  # python int: folds into ops, no captured constant


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --- row-level field arithmetic (inside kernels) ---------------------------
# A field element batch inside a kernel is a list of L arrays ("rows"), each
# (TB, 128) uint32 with values < 2^16 (except transient lazy columns).


def rows_mont_mul(spec: FieldSpec, a, b):
    """Montgomery product on row lists; returns L rows."""
    L = spec.L
    n0 = int(spec.n0inv)
    Nl = [int(x) for x in spec.N]
    cols = [None] * (2 * L + 1)
    for i in range(L):
        ai = a[i]
        for j in range(L):
            p = ai * b[j]
            lo = p & MASK
            hi = p >> 16
            cols[i + j] = lo if cols[i + j] is None else cols[i + j] + lo
            cols[i + j + 1] = hi if cols[i + j + 1] is None else cols[i + j + 1] + hi
    # CIOS
    for _ in range(L):
        m = (cols[0] * n0) & MASK
        for j in range(L):
            mn = m * Nl[j]
            cols[j] = cols[j] + (mn & MASK)
            cols[j + 1] = cols[j + 1] + (mn >> 16)
        cols[1] = cols[1] + (cols[0] >> 16)
        cols = cols[1:]
    return rows_carry_reduce(spec, cols[:L])


def rows_carry_reduce(spec: FieldSpec, t):
    """Carry-propagate L lazy rows (< 2^24, value < 2N) + conditional
    subtract N."""
    L = spec.L
    out = []
    c = jnp.zeros_like(t[0])
    for i in range(L):
        v = t[i] + c
        out.append(v & MASK)
        c = v >> 16
    # subtract N with borrow (signed arithmetic)
    diff = []
    borrow = jnp.zeros_like(c, dtype=jnp.int32)
    for i in range(L):
        v = out[i].astype(jnp.int32) - int(spec.N[i]) - borrow
        diff.append((v & 0xFFFF).astype(jnp.uint32))
        borrow = (v < 0).astype(jnp.int32)
    ge = jnp.logical_or(c > 0, borrow == 0)
    return [jnp.where(ge, d, o) for d, o in zip(diff, out)]


def rows_add(spec: FieldSpec, a, b):
    return rows_carry_reduce(spec, [x + y for x, y in zip(a, b)])


def rows_sub(spec: FieldSpec, a, b):
    L = spec.L
    out = []
    carry = jnp.zeros_like(a[0], dtype=jnp.int32)
    for i in range(L):
        v = (
            a[i].astype(jnp.int32)
            + int(spec.N[i])
            - b[i].astype(jnp.int32)
            + carry
        )
        out.append((v & 0xFFFF).astype(jnp.uint32))
        carry = v >> 16  # arithmetic shift
    return rows_carry_reduce(spec, out)


def rows_mul_small(spec: FieldSpec, a, k: int):
    if k == 3:
        return rows_add(spec, rows_add(spec, a, a), a)
    if k == 12:
        t = rows_add(spec, rows_add(spec, a, a), a)
        t = rows_add(spec, t, t)
        return rows_add(spec, t, t)
    raise ValueError(k)


# --- Fq2 rows: 2L rows, c0 then c1 -----------------------------------------


def rows2_mul(spec, a, b):
    L = spec.L
    a0, a1 = a[:L], a[L:]
    b0, b1 = b[:L], b[L:]
    v0 = rows_mont_mul(spec, a0, b0)
    v1 = rows_mont_mul(spec, a1, b1)
    s = rows_mont_mul(spec, rows_add(spec, a0, a1), rows_add(spec, b0, b1))
    c0 = rows_sub(spec, v0, v1)
    c1 = rows_sub(spec, rows_sub(spec, s, v0), v1)
    return c0 + c1


def rows2_add(spec, a, b):
    L = spec.L
    return rows_add(spec, a[:L], b[:L]) + rows_add(spec, a[L:], b[L:])


def rows2_sub(spec, a, b):
    L = spec.L
    return rows_sub(spec, a[:L], b[:L]) + rows_sub(spec, a[L:], b[L:])


def rows2_b3_mul(spec, a):
    """* 12(1+u): scale by 12, then (c0 - c1) + (c0 + c1) u."""
    L = spec.L
    t0 = rows_mul_small(spec, a[:L], 12)
    t1 = rows_mul_small(spec, a[L:], 12)
    return rows_sub(spec, t0, t1) + rows_add(spec, t0, t1)


# --- point addition (RCB'15 a=0, complete) on rows -------------------------


def rows_point_add(mul, add, sub, b3_mul, p, q):
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
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
    t2 = b3_mul(t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = b3_mul(Y3)
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


def rows_point_add01(mul, add, sub, b3_mul, mask_of, const_sel, p, q):
    """RCB'15 complete add SPECIALIZED to Z1, Z2 ∈ {0, mont-1} — the MSM
    ladder's leaf level (gathered parameter rows are affine points or
    encoded identities). Three of the 12 field muls collapse:
      t2 = Z1*Z2            -> a constant select on the two masks
      (Y1+Z1)(Y2+Z2)-t1-t2  -> Y1*Z2 + Z1*Y2 = sel(m2,Y1) + sel(m1,Y2)
      (X1+Z1)(X2+Z2)-t0-t2  -> sel(m2,X1) + sel(m1,X2)
    mask_of(Z) -> boolean (TB,128) mask (Z != 0); const_sel(mask) -> rows
    of mont-1 where mask else 0 (limb constants fold into the kernel)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    m1 = mask_of(Z1)
    m2 = mask_of(Z2)

    def msel(m, rows):
        return [jnp.where(m, r, 0) for r in rows]

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = const_sel(jnp.logical_and(m1, m2))
    t3 = add(X1, Y1)
    t4 = add(X2, Y2)
    t3 = mul(t3, t4)
    t4 = add(t0, t1)
    t3 = sub(t3, t4)
    t4 = add(msel(m2, Y1), msel(m1, Y2))   # was (Y1+Z1)(Y2+Z2)-t1-t2
    Y3 = add(msel(m2, X1), msel(m1, X2))   # was (X1+Z1)(X2+Z2)-t0-t2
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = b3_mul(t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = b3_mul(Y3)
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


# --- batch-affine ladder kernels (round 5) ---------------------------------
# The affine MSM ladder composes ~25 field ops per level; as standalone
# pallas calls each would pay a (B, L) <-> (L, B/128, 128) layout transpose
# (measured ~4-5 ms per pair at 2^20x24 — 8x the muls they wrap). These two
# kernels fuse the elementwise halves of the level so arrays stay in kernel
# layout end-to-end; the product-tree muls between them use the plain
# mont_mul kernel on kernel-layout operands directly.


def _rows_eq(a, b):
    m = a[0] == b[0]
    for x, y in zip(a[1:], b[1:]):
        m = jnp.logical_and(m, x == y)
    return m


def _rows_sel(m, a, b):
    return [jnp.where(m, x, y) for x, y in zip(a, b)]


def _affine_pre_kernel(spec, x1r, y1r, x2r, y2r, f1r, f2r, n_o, d_o, c_o):
    """Masks + slope numerator/denominator for one batch-affine level.
    Inputs: coords (L, TB, 128) of P1, P2 (canonical affine; garbage on
    infinity lanes) + infinity flags (TB, 128). Outputs n_eff, d_eff
    (d masked to 1 on dead lanes so the product tree stays invertible)
    and a per-lane case code (bit0 inf1, bit1 inf2, bit2 result-infinity).
    """
    from masp_tpu.ops.limbs import int_to_limbs

    L = spec.L
    x1 = _read_rows(x1r, L)
    y1 = _read_rows(y1r, L)
    x2 = _read_rows(x2r, L)
    y2 = _read_rows(y2r, L)
    i1 = f1r[...] != 0
    i2 = f2r[...] != 0
    one_limbs = [int(v) for v in int_to_limbs(spec.R_mod, L)]
    one = [jnp.full_like(x1[0], jnp.uint32(v)) for v in one_limbs]
    zero = [jnp.zeros_like(x1[0]) for _ in range(L)]

    fin = jnp.logical_and(~i1, ~i2)
    xeq = _rows_eq(x1, x2)
    yneg = _rows_eq(y1, rows_sub(spec, zero, y2))
    res_inf = jnp.logical_and(fin, jnp.logical_and(xeq, yneg))
    use_dbl = jnp.logical_and(fin, jnp.logical_and(xeq, ~yneg))
    live = jnp.logical_and(fin, ~res_inf)

    sq1 = rows_mont_mul(spec, x1, x1)
    n3 = rows_add(spec, rows_add(spec, sq1, sq1), sq1)
    n_eff = _rows_sel(use_dbl, n3, rows_sub(spec, y2, y1))
    d_eff = _rows_sel(use_dbl, rows_add(spec, y1, y1), rows_sub(spec, x2, x1))
    d_eff = _rows_sel(live, d_eff, one)

    _write_rows(n_o, n_eff)
    _write_rows(d_o, d_eff)
    c_o[...] = (
        i1.astype(jnp.uint32)
        | (i2.astype(jnp.uint32) << 1)
        | (res_inf.astype(jnp.uint32) << 2)
    )


def _affine_post_kernel(spec, nr, ivr, x1r, y1r, x2r, y2r, cr, x3_o, y3_o, f3_o):
    """lam = n * inv(d); chord/tangent x3, y3; pass-throughs and infinity
    normalization (infinity lanes come out (0, mont-1) so a projective
    lift Z = inf ? 0 : 1 yields the canonical (0 : 1 : 0))."""
    from masp_tpu.ops.limbs import int_to_limbs

    L = spec.L
    n = _read_rows(nr, L)
    iv = _read_rows(ivr, L)
    x1 = _read_rows(x1r, L)
    y1 = _read_rows(y1r, L)
    x2 = _read_rows(x2r, L)
    y2 = _read_rows(y2r, L)
    code = cr[...]
    i1 = (code & 1) != 0
    i2 = (code & 2) != 0
    res_inf = (code & 4) != 0
    one_limbs = [int(v) for v in int_to_limbs(spec.R_mod, L)]
    one = [jnp.full_like(n[0], jnp.uint32(v)) for v in one_limbs]
    zero = [jnp.zeros_like(n[0]) for _ in range(L)]

    lam = rows_mont_mul(spec, n, iv)
    lam2 = rows_mont_mul(spec, lam, lam)
    x3 = rows_sub(spec, rows_sub(spec, lam2, x1), x2)
    y3 = rows_sub(spec, rows_mont_mul(spec, lam, rows_sub(spec, x1, x3)), y1)

    xo = _rows_sel(i1, x2, _rows_sel(i2, x1, x3))
    yo = _rows_sel(i1, y2, _rows_sel(i2, y1, y3))
    fo = jnp.logical_or(jnp.logical_and(i1, i2), res_inf)
    xo = _rows_sel(fo, zero, xo)
    yo = _rows_sel(fo, one, yo)
    _write_rows(x3_o, xo)
    _write_rows(y3_o, yo)
    f3_o[...] = fo.astype(jnp.uint32)


# --- kernels ---------------------------------------------------------------

TB = 8  # sublane-group batch per program (TB*128 elements)


def _read_rows(ref, L):
    # layout (L, TB, 128): indexing the major axis keeps (TB, 128) tiles
    return [ref[i] for i in range(L)]


def _write_rows(ref, rows):
    for i, r in enumerate(rows):
        ref[i] = r


def _mont_mul_kernel(spec, a_ref, b_ref, o_ref):
    a = _read_rows(a_ref, spec.L)
    b = _read_rows(b_ref, spec.L)
    _write_rows(o_ref, rows_mont_mul(spec, a, b))


def _g1_add_kernel(spec, px, py, pz, qx, qy, qz, ox, oy, oz):
    L = spec.L
    mul = partial(rows_mont_mul, spec)
    add = partial(rows_add, spec)
    sub = partial(rows_sub, spec)
    b3 = partial(rows_mul_small, spec, k=12)
    p = tuple(_read_rows(r, L) for r in (px, py, pz))
    q = tuple(_read_rows(r, L) for r in (qx, qy, qz))
    X3, Y3, Z3 = rows_point_add(
        mul, add, sub, lambda a: rows_mul_small(spec, a, 12), p, q
    )
    _write_rows(ox, X3)
    _write_rows(oy, Y3)
    _write_rows(oz, Z3)


def _g1_add01_kernel(spec, px, py, pz, qx, qy, qz, ox, oy, oz):
    from masp_tpu.ops.field_jax import int_to_limbs

    L = spec.L
    one_limbs = [int(x) for x in int_to_limbs(spec.R_mod, L)]
    p = tuple(_read_rows(r, L) for r in (px, py, pz))
    q = tuple(_read_rows(r, L) for r in (qx, qy, qz))

    def const_sel(m):
        return [jnp.where(m, jnp.uint32(v), jnp.uint32(0)) for v in one_limbs]

    X3, Y3, Z3 = rows_point_add01(
        partial(rows_mont_mul, spec),
        partial(rows_add, spec),
        partial(rows_sub, spec),
        lambda a: rows_mul_small(spec, a, 12),
        lambda Z: Z[0] != 0,
        const_sel,
        p, q,
    )
    _write_rows(ox, X3)
    _write_rows(oy, Y3)
    _write_rows(oz, Z3)


def _g2_add01_kernel(spec, px, py, pz, qx, qy, qz, ox, oy, oz):
    from masp_tpu.ops.field_jax import int_to_limbs

    L = spec.L
    L2 = 2 * L
    one_limbs = [int(x) for x in int_to_limbs(spec.R_mod, L)]
    p = tuple(_read_rows(r, L2) for r in (px, py, pz))
    q = tuple(_read_rows(r, L2) for r in (qx, qy, qz))

    def const_sel(m):
        c0 = [jnp.where(m, jnp.uint32(v), jnp.uint32(0)) for v in one_limbs]
        zero = jnp.zeros_like(c0[0])
        return c0 + [zero] * L

    X3, Y3, Z3 = rows_point_add01(
        partial(rows2_mul, spec),
        partial(rows2_add, spec),
        partial(rows2_sub, spec),
        partial(rows2_b3_mul, spec),
        lambda Z: Z[0] != 0,  # Fq2 mont-1 = (R mod q, 0): c0 limb 0 != 0
        const_sel,
        p, q,
    )
    _write_rows(ox, X3)
    _write_rows(oy, Y3)
    _write_rows(oz, Z3)


def _g2_add_kernel(spec, px, py, pz, qx, qy, qz, ox, oy, oz):
    L2 = 2 * spec.L
    p = tuple(_read_rows(r, L2) for r in (px, py, pz))
    q = tuple(_read_rows(r, L2) for r in (qx, qy, qz))
    X3, Y3, Z3 = rows_point_add(
        partial(rows2_mul, spec),
        partial(rows2_add, spec),
        partial(rows2_sub, spec),
        partial(rows2_b3_mul, spec),
        p,
        q,
    )
    _write_rows(ox, X3)
    _write_rows(oy, Y3)
    _write_rows(oz, Z3)


# --- layout codecs ---------------------------------------------------------


def to_kernel_layout(x, tb: int = TB):
    """(B, L) or (B, 2, L) -> (Lk, B1, 128) with B padded to tb*128; returns
    (array, B)."""
    B = x.shape[0]
    Lk = x.shape[1] * x.shape[2] if x.ndim == 3 else x.shape[1]
    x = x.reshape(B, Lk)
    pad = (-B) % (tb * LANE)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Bp = B + pad
    # (Bp, Lk) -> (Lk, Bp) -> (Lk, B1, 128): limb-major so kernels index
    # whole (TB, 128) tiles per limb
    x = jnp.swapaxes(x, 0, 1).reshape(Lk, Bp // LANE, LANE)
    return x, B


def from_kernel_layout(x, B, coord_shape):
    """(Lk, B1, 128) -> (B,) + coord_shape."""
    Lk, B1, _ = x.shape
    x = jnp.swapaxes(x.reshape(Lk, B1 * LANE), 0, 1)[:B]
    return x.reshape((B,) + coord_shape)


def _block_spec(Lk, tb):
    return pl.BlockSpec((Lk, tb, LANE), lambda i: (0, i, 0))


@lru_cache(maxsize=None)
def _g_add_callable(kind: str, tb: int):
    """kind: 'g1'/'g2' (complete add) or 'g1_01'/'g2_01' (leaf-level add
    specialized to Z in {0, mont-1}: 9 muls instead of 12). Returns
    f(6 coord arrays in kernel layout) -> 3."""
    spec = FQ
    Lk = spec.L if kind.startswith("g1") else 2 * spec.L
    kernel = {
        "g1": _g1_add_kernel, "g2": _g2_add_kernel,
        "g1_01": _g1_add01_kernel, "g2_01": _g2_add01_kernel,
    }[kind]
    kern = partial(kernel, spec)  # one object: lets tracing/lowering cache

    def run(px, py, pz, qx, qy, qz):
        B1 = px.shape[1]
        grid = (B1 // tb,)
        return pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct(px.shape, jnp.uint32)] * 3,
            grid=grid,
            in_specs=[_block_spec(Lk, tb)] * 6,
            out_specs=[_block_spec(Lk, tb)] * 3,
            interpret=_interpret(),
        )(px, py, pz, qx, qy, qz)

    # jit wrapper: the kernel body traces once per shape (pjit caches the
    # jaxpr), instead of once per call site in every enclosing trace
    return jax.jit(run)


def pallas_point_add(fops_kind: str, p, q, coord_shape):
    """p, q: tuples of (B,)+coord_shape arrays. Returns same-layout sum.

    Always uses the TB=8 kernel variant: small batches pad to 8*128 (the
    padding adds are negligible), keeping ONE traced pallas body per group
    kind (each extra (kind, tb) variant costs ~25-30 s of per-process
    kernel tracing) and keeping block shapes divisible by (8, 128)."""
    B = p[0].shape[0]
    enc = [to_kernel_layout(c, TB)[0] for c in (*p, *q)]
    ox, oy, oz = _g_add_callable(fops_kind, TB)(*enc)
    return tuple(from_kernel_layout(o, B, coord_shape) for o in (ox, oy, oz))


def pallas_point_add01(fops_kind: str, p, q, coord_shape):
    """pallas_point_add for operands whose Z is 0 or Montgomery-1 (the MSM
    ladder's LEAF level: encoded affine parameter points / identity pads):
    9 field muls instead of 12. The padding introduced by to_kernel_layout
    is all-zero rows = identities, valid inputs for this formula."""
    B = p[0].shape[0]
    enc = [to_kernel_layout(c, TB)[0] for c in (*p, *q)]
    ox, oy, oz = _g_add_callable(fops_kind + "_01", TB)(*enc)
    return tuple(from_kernel_layout(o, B, coord_shape) for o in (ox, oy, oz))


def _flag_spec(tb):
    return pl.BlockSpec((tb, LANE), lambda i: (i, 0))


@lru_cache(maxsize=None)
def _affine_pre_callable(tb: int):
    spec = FQ
    kern = partial(_affine_pre_kernel, spec)

    def run(x1, y1, x2, y2, f1, f2):
        B1 = x1.shape[1]
        grid = (B1 // tb,)
        cspec = _block_spec(spec.L, tb)
        return pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct(x1.shape, jnp.uint32),
                jax.ShapeDtypeStruct(x1.shape, jnp.uint32),
                jax.ShapeDtypeStruct(f1.shape, jnp.uint32),
            ],
            grid=grid,
            in_specs=[cspec] * 4 + [_flag_spec(tb)] * 2,
            out_specs=[cspec, cspec, _flag_spec(tb)],
            interpret=_interpret(),
        )(x1, y1, x2, y2, f1, f2)

    return jax.jit(run)


@lru_cache(maxsize=None)
def _affine_post_callable(tb: int):
    spec = FQ
    kern = partial(_affine_post_kernel, spec)

    def run(n, iv, x1, y1, x2, y2, code):
        B1 = x1.shape[1]
        grid = (B1 // tb,)
        cspec = _block_spec(spec.L, tb)
        return pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct(x1.shape, jnp.uint32),
                jax.ShapeDtypeStruct(x1.shape, jnp.uint32),
                jax.ShapeDtypeStruct(code.shape, jnp.uint32),
            ],
            grid=grid,
            in_specs=[cspec] * 6 + [_flag_spec(tb)],
            out_specs=[cspec, cspec, _flag_spec(tb)],
            interpret=_interpret(),
        )(n, iv, x1, y1, x2, y2, code)

    return jax.jit(run)


def klay_mont_mul(spec: FieldSpec, a, b):
    """mont_mul on kernel-layout (L, B1, 128) operands — no layout
    conversion (the caller keeps arrays in kernel layout)."""
    return _mont_mul_callable(spec.name, TB)(a, b)


def klay_affine_level(x1, y1, f1, x2, y2, f2):
    """One batch-affine ladder level entirely in kernel layout (Fq/G1):
    pre-kernel (masks + slope operands), product-tree batched inversion
    (fold halving on the B1 axis + a tiny batch-major tail + one windowed
    Fermat), post-kernel (lam, x3, y3, case selects). coords (24, B1, 128);
    flags (B1, 128) uint32."""
    import jax.numpy as jnp  # noqa: F811 (kernel-module-level alias)

    from masp_tpu.ops import field_jax as F

    n_eff, d_eff, code = _affine_pre_callable(TB)(x1, y1, x2, y2, f1, f2)

    # product tree: fold halves on the batch-group axis while wide, finish
    # the narrow tail batch-major (tiny arrays; pallas per-call cost is us
    # inside one program), Fermat once on the root
    prods = [d_eff]
    while prods[-1].shape[1] > TB:
        p = prods[-1]
        h = p.shape[1] // 2
        prods.append(klay_mont_mul(FQ, p[:, :h], p[:, h:]))
    tail = from_kernel_layout(prods[-1], TB * LANE, (FQ.L,))
    tprods = [tail]
    while tprods[-1].shape[0] > 1:
        p = tprods[-1]
        h = p.shape[0] // 2
        tprods.append(F.mont_mul(FQ, p[:h], p[h:]))
    inv_t = F.mont_inv_small(FQ, tprods[-1])
    for p in reversed(tprods[:-1]):
        h = p.shape[0] // 2
        ie = F.mont_mul(FQ, inv_t, p[h:])
        io = F.mont_mul(FQ, inv_t, p[:h])
        inv_t = jnp.concatenate([ie, io], axis=0)
    inv = to_kernel_layout(inv_t, TB)[0]
    for p in reversed(prods[:-1]):
        h = p.shape[1] // 2
        ie = klay_mont_mul(FQ, inv, p[:, h:])
        io = klay_mont_mul(FQ, inv, p[:, :h])
        inv = jnp.concatenate([ie, io], axis=1)

    return _affine_post_callable(TB)(n_eff, inv, x1, y1, x2, y2, code)


@lru_cache(maxsize=None)
def _mont_mul_callable(spec_name: str, tb: int):
    spec = FR if spec_name == "Fr" else FQ
    kern = partial(_mont_mul_kernel, spec)

    def run(a, b):
        B1 = a.shape[1]
        grid = (B1 // tb,)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
            grid=grid,
            in_specs=[_block_spec(spec.L, tb)] * 2,
            out_specs=_block_spec(spec.L, tb),
            interpret=_interpret(),
        )(a, b)

    return jax.jit(run)


def pallas_mont_mul(spec: FieldSpec, a, b):
    """Drop-in for F.mont_mul on (..., L) arrays: operands broadcast
    symmetrically (a constant (L,) times a batched (B, L) works in either
    argument order — the one-sided broadcast here crashed
    batch_from_bytes's D_MONT * v2 with a batch on the right)."""
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a2 = jnp.broadcast_to(a, shape + (spec.L,)).reshape(-1, spec.L)
    b2 = jnp.broadcast_to(b, shape + (spec.L,)).reshape(-1, spec.L)
    ak, B = to_kernel_layout(a2, TB)
    bk, _ = to_kernel_layout(b2, TB)
    out = _mont_mul_callable(spec.name, TB)(ak, bk)
    return from_kernel_layout(out, B, (spec.L,)).reshape(shape + (spec.L,))


__all__ = [
    "pallas_mont_mul", "pallas_point_add", "to_kernel_layout",
    "from_kernel_layout", "rows_mont_mul", "rows_add", "rows_sub",
]

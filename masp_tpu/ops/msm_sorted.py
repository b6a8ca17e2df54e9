"""Sorted-prefix Pippenger MSM on TPU.

Replaces the round-1 lane-private-bucket main loop (ops/msm.py
pippenger_msm), whose cost was dominated by per-step bucket-state
gather/scatter traffic (~2N*W gathered rows per MSM). This design, per
c-bit window:

1.  sort point indices by digit (lax.sort_key_val — measured ~per-mil of
    the MSM on v5e even for all windows of a 2^17 MSM),
2.  gather the points into sorted order ONCE, as packed [X|Y|Z] rows so
    the row count is N (TPU gathers cost per row, not per byte),
3.  build an UNSEGMENTED dyadic prefix tree over the sorted points with a
    halving ladder of complete adds (N-1 adds; every level a big batched
    kernel, no serial step loop),
4.  read each bucket's sum as a difference of two exclusive-prefix
    queries at the bucket boundaries (searchsorted): prefix(p) is the sum
    of <= log2(N)+1 tree nodes selected by the bits of p, so segmented
    reduction costs B*(log2(N)+1) adds instead of any scatter,
5.  weighted bucket reduction + Horner over windows (shared with the
    fixed-base path).

Total group adds per window: N + B*(log2 N + 2) — within a few percent of
the information-theoretic N. Group subtraction is an add of the negated
point (complete formulas; projective identity handled for free).

Semantics equivalent to bellperson's multiexp core (reference
masp_proofs -> bellperson multiexp, SURVEY.md §2.4/§3.1 HOT list).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from masp_tpu.ops import weierstrass_jax as W
from masp_tpu.ops.msm import _traced_identity

# How the per-window body runs: "scan" (default — sequential windows) or
# vmapped over windows (MASP_MSM_VMAP_WINDOWS=1). Measured on v5e (2^17
# c=8 G1): vmap 257 ms vs scan 219 ms — a NEGATIVE result kept for the
# record. The scan keeps each window's ~37 MB working set (gathered rows +
# tree nodes) local, where XLA can stage it through VMEM; vmapping windows
# materializes W x that (~1.2-2.4 GB) through HBM, and the extra traffic
# costs more than the per-step overheads it saves.
VMAP_WINDOWS = os.environ.get("MASP_MSM_VMAP_WINDOWS", "0")


def _use_vmap(n: int) -> bool:
    return VMAP_WINDOWS == "1"


def n_windows_for(c: int, signed: bool = False) -> int:
    """Window count for 255-bit scalars: ceil(255/c), plus one extra
    all-carry window when the signed conversion's final carry would not
    fit the top window's headroom (max top digit + carry must stay
    <= 2^(c-1) so it is never itself converted)."""
    assert 2 <= c <= 16, c
    W_ = -(-255 // c)
    if signed:
        t_bits = 255 - c * (W_ - 1)  # bits landing in the top window
        if (1 << t_bits) > (1 << (c - 1)):
            W_ += 1
    return W_


def windows_from_limbs(limbs16, c: int, signed: bool = False):
    """Device digit extraction: (N, 16) canonical 16-bit Fr limbs (LE, as
    uint32) -> (N, W) int32 window digits, W = n_windows_for(c, signed).

    With ``signed`` the digits are carry-converted to the balanced
    representation d in [-2^(c-1), 2^(c-1)] (bucket count halves to
    2^(c-1)+1): whenever d > 2^(c-1), emit d - 2^c and carry 1. The top
    window absorbs the final carry without overflow (n_windows_for adds a
    window when the spill bits leave no headroom). Runs inside the
    caller's jit, so host digit marshalling disappears."""
    W_ = n_windows_for(c, signed)
    idx = np.minimum(np.arange(W_) * c // 16, 15)
    off = jnp.asarray((np.arange(W_) * c % 16).astype(np.uint32))
    lo = limbs16[:, idx]
    hi = limbs16[:, np.minimum(idx + 1, 15)]
    pair = lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << jnp.uint32(16))
    # per-window mask: only bits < 256 are real (scalars are < 2^255);
    # positions past limb 15 alias limb 15 through the clipped gather
    valid = np.clip(256 - np.arange(W_) * c, 0, c)
    wmask = jnp.asarray(((1 << valid) - 1).astype(np.uint32))
    d = ((pair >> off[None, :]) & wmask[None, :]).astype(jnp.int32)
    if not signed:
        return d
    half = 1 << (c - 1)

    def body(carry, dw):
        dw = dw + carry
        conv = dw > half
        return conv.astype(jnp.int32), jnp.where(conv, dw - (1 << c), dw)

    _, out = jax.lax.scan(body, jnp.zeros((limbs16.shape[0],), jnp.int32), d.T)
    return out.T


def pack_points(points_xyz):
    """3 coord arrays (N, ...) -> (N, 3*prod(cshape)) u32 rows."""
    n = points_xyz[0].shape[0]
    return jnp.concatenate([c.reshape(n, -1) for c in points_xyz], axis=1)


def _unpack(fops, rows):
    cshape = fops.coord_shape
    k = int(np.prod(cshape))
    n = rows.shape[0]
    return tuple(
        rows[:, i * k : (i + 1) * k].reshape((n,) + cshape) for i in range(3)
    )


def _g_neg(fops, p):
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops.field_jax import FQ

    if hasattr(fops, "neg_point"):  # e.g. Edwards: negate X, not Y
        return fops.neg_point(p)
    X, Y, Z = p
    if len(fops.coord_shape) == 1:
        return (X, F.neg(FQ, Y), Z)
    ny = jnp.stack(
        [F.neg(FQ, Y[..., 0, :]), F.neg(FQ, Y[..., 1, :])], axis=-2
    )
    return (X, ny, Z)


# Wide (suffix-scan) bucket reduction: log2(B) W-wide add steps + a
# halving-ladder sum instead of B-1 sequential running-suffix steps.
# Measured NEGATIVE on v5e (Spend serial 1.016 -> 1.127 s/proof): the
# ~3.5x extra group adds (65k vs 16k per MSM) cost more than the 510->16
# step-count reduction saves — per-step overhead inside one compiled
# program is small, unlike across dispatches. Kept for the record.
WIDE_REDUCE = os.environ.get("MASP_MSM_WIDE_REDUCE", "0") == "1"


def bucket_reduce_horner(fops, buckets, c: int, like, wide: bool | None = None):
    """(W, B, ...) bucket sums -> single projective point (no batch axis).

    window[w] = sum_k k * bucket[w, k] via the running-suffix trick, then
    Horner combine over windows with c doublings between them."""
    bx, by, bz = buckets
    n_windows = bx.shape[0]
    B = bx.shape[1]

    # the fori path's B-1 sequential width-W steps lose badly once B is
    # large and W small (the BGMW merged window: W=1, B=4096 -> 8190
    # width-1 steps); the suffix scan's log2(B) wide steps win there.
    # Callers can force `wide` — the flat-affine path measured the wide
    # form ~5 ms faster at (32, 256) on v5e (round 5).
    if wide is None:
        wide = WIDE_REDUCE or B >= 1024
    if wide:
        # suffix scan along the bucket axis, then sum_{j>=1} S[w, j]
        cur = (bx, by, bz)
        ident_wb = _traced_identity(fops, like, (n_windows, B))
        d = 1
        while d < B:
            shifted = tuple(
                jnp.concatenate([cc[:, d:], iw[:, :d]], axis=1)
                for cc, iw in zip(cur, ident_wb)
            )
            cur = W.g_add(fops, cur, shifted)
            d *= 2
        Bp = 1 << (B - 2).bit_length() if B > 2 else 1
        ident_pad = _traced_identity(fops, like, (n_windows, Bp - (B - 1)))
        cur = tuple(
            jnp.concatenate([cc[:, 1:], ip], axis=1)
            for cc, ip in zip(cur, ident_pad)
        )
        while cur[0].shape[1] > 1:
            nh = cur[0].shape[1] // 2
            paired = [
                cc.reshape((n_windows, nh, 2) + cc.shape[2:]) for cc in cur
            ]
            cur = W.g_add(
                fops,
                tuple(pc[:, :, 0] for pc in paired),
                tuple(pc[:, :, 1] for pc in paired),
            )
        window_sums = tuple(cc[:, 0] for cc in cur)
    else:
        ident_w = _traced_identity(fops, like, (n_windows,))

        def bucket_body(j, carry):
            running, acc = carry
            k = B - 1 - j  # k from B-1 down to 1
            bucket = (bx[:, k], by[:, k], bz[:, k])
            running = W.g_add(fops, running, bucket)
            acc = W.g_add(fops, acc, running)
            return (running, acc)

        _, window_sums = jax.lax.fori_loop(
            0, B - 1, bucket_body, (ident_w, ident_w)
        )

    ident_1 = _traced_identity(fops, like, (1,))

    def window_body(j, acc):
        w = n_windows - 1 - j
        acc = W.g_add(
            fops,
            acc,
            tuple(jax.lax.dynamic_slice_in_dim(s, w, 1, 0) for s in window_sums),
        )

        def dbl_body(_i, a):
            return W.g_add(fops, a, a)

        doubled = jax.lax.fori_loop(0, c, dbl_body, acc)
        # don't double after the last (lowest) window
        return W.point_select(jnp.asarray([j < n_windows - 1]), doubled, acc)

    acc = jax.lax.fori_loop(0, n_windows, window_body, ident_1)
    return tuple(s[0] for s in acc)


def window_buckets(fops, points_packed, digits, c: int, signed: bool = False):
    """Per-window bucket sums (W, B, ...) — the data-parallel bulk of the
    MSM (everything except the final bucket-weighted reduction). Separated
    out so the mesh path can compute shard-local buckets and tree-reduce
    them across devices before one shared reduction.

    With ``signed``, digits are balanced in [-2^(c-1), 2^(c-1)]
    (windows_from_limbs(signed=True)): points with negative digits enter
    the prefix tree negated, and the bucket count drops to B = 2^(c-1)+1
    — halving the B*(log2 N + 2) bucket-query adds per window."""
    if _affine_on(fops):
        # batch-affine flattened ladder (round 5): bit-identical buckets,
        # ~7 muls/add on the first AFFINE_LEVELS levels
        return window_buckets_flat(fops, points_packed, digits, c,
                                   signed=signed)
    N = points_packed.shape[0]
    n_windows = digits.shape[1]
    B = (1 << (c - 1)) + 1 if signed else 1 << c
    levels = (N - 1).bit_length()
    assert N == 1 << levels, "pad N to a power of two"

    if signed:
        keys = jnp.abs(digits).T.astype(jnp.int32)  # (W, N)
        signs = (digits < 0).T.astype(jnp.int32)     # (W, N)
    else:
        keys = digits.T.astype(jnp.int32)  # (W, N)
        signs = jnp.zeros_like(keys)
    iota = jnp.arange(N, dtype=jnp.int32)
    sorted_keys, perm = jax.vmap(lambda k: jax.lax.sort_key_val(k, iota))(keys)
    # bounds[w, k] = #{digits[:, w] <= k}  (exclusive prefix boundary)
    kvals = jnp.arange(B, dtype=jnp.int32)
    bounds = jax.vmap(lambda sk: jnp.searchsorted(sk, kvals, side="right"))(
        sorted_keys
    ).astype(jnp.int32)

    # coord-shaped traced array for in-graph identity construction
    like = _unpack(fops, points_packed)[0]

    def win_body(_, inp):
        perm_w, bounds_w, signs_w = inp
        rows = jnp.take(points_packed, perm_w, axis=0)  # (N, rowlen)
        cur = _unpack(fops, rows)
        if signed:
            sg = jnp.take(signs_w, perm_w)
            cur = W.point_select(sg, _g_neg(fops, cur), cur)

        # up-sweep: nodes[l][j] = sum of sorted points [j*2^l, (j+1)*2^l)
        # (leaf level via the Z∈{0,mont1} specialized add: the gathered
        # rows are encoded affine parameter points or identity pads)
        nodes = [cur]
        for _l in range(levels):
            n_half = cur[0].shape[0] // 2
            paired = [
                cc.reshape((n_half, 2) + cc.shape[1:]) for cc in cur
            ]
            e = tuple(pc[:, 0] for pc in paired)
            o = tuple(pc[:, 1] for pc in paired)
            cur = (W.g_add01 if _l == 0 else W.g_add)(fops, e, o)
            nodes.append(cur)

        # exclusive-prefix queries at the B bucket boundaries
        acc = _traced_identity(fops, like, (B,))
        for l in range(levels + 1):
            idx = 2 * (bounds_w >> (l + 1))
            bit = (bounds_w >> l) & 1
            nd = nodes[l]
            gath = tuple(jnp.take(cc, idx, axis=0, mode="clip") for cc in nd)
            added = W.g_add(fops, acc, gath)
            acc = W.point_select(bit, added, acc)

        # bucket k sum = Q[k] - Q[k-1]; Q[-1] = identity
        ident_1 = _traced_identity(fops, like, (1,))
        qprev = tuple(
            jnp.concatenate([i1, cc[:-1]], axis=0)
            for i1, cc in zip(ident_1, acc)
        )
        bucket = W.g_add(fops, acc, _g_neg(fops, qprev))
        return 0, bucket

    if _use_vmap(N):
        return jax.vmap(lambda p, b, s: win_body(0, (p, b, s))[1])(
            perm, bounds, signs
        )  # (W, B, ...)
    _, buckets = jax.lax.scan(win_body, 0, (perm, bounds, signs))  # (W, B, ...)
    return buckets


def sorted_msm(fops, points_packed, digits, c: int, signed: bool = False):
    """sum_i [s_i] P_i.

    points_packed: (N, 3*prod(cshape)) u32 packed projective rows
    (pack_points); digits: (N, W) int32 c-bit windows (balanced when
    ``signed``). N must be a power of two (pad with identity rows + zero
    digits). Returns one projective point (coords with no batch axis).
    """
    buckets = window_buckets(fops, points_packed, digits, c, signed=signed)
    like = _unpack(fops, points_packed)[0]
    wide = True if _affine_on(fops) else None
    return bucket_reduce_horner(fops, buckets, c, like, wide=wide)


def sorted_msm_from_limbs(fops, points_packed, limbs16, c: int,
                          signed: bool = True):
    """sorted_msm with in-graph digit extraction: limbs16 is the (N, 16)
    canonical 16-bit-limb scalar array (the native field layout — a
    reinterpret of the witness u64 words, no host digit marshalling).
    Balanced signed digits by default."""
    digits = windows_from_limbs(limbs16, c, signed=signed)
    return sorted_msm(fops, points_packed, digits, c, signed=signed)


# --- batch-affine ladder (round 5) -----------------------------------------
#
# The dyadic halving ladder is the MSM's hot phase (~70% of prove time,
# VPU-ALU-bound at ~12 Fq mont_muls per complete projective add). Within a
# ladder level every add is independent, so the adds can run in AFFINE form
# with ONE exact batched inversion per level (product tree: 3 amortized muls
# per lane + a single tiny-width Fermat root inverse): chord/tangent slope +
# x3/y3 cost 7 muls per add instead of 12, with branch-free masked lanes for
# the doubling / P+(-P) / identity cases. The affine form is used for the
# first MASP_MSM_AFFINE_LEVELS levels (level l has N/2^l of the adds, so the
# savings halve per level while the per-level Fermat inverse is constant);
# deeper levels fall back to the complete projective formula.
#
# Requires the window axis to be FLATTENED into the lane axis (one Fermat
# per level total, not per window x level) — window_buckets_flat below.
# Precondition (same as the round-4 leaf-specialized add): input rows are
# encoded affine points or identity pads, i.e. Z in {0, mont-1}.
#
# Measured on v5e (2^17 c=8 G1 sorted_msm): 139 ms flat-affine (K=4, fused
# kernel-layout level kernels + packed flag gather + partial-bit-reversal
# transpose + wide reduce) vs 152 ms scan-projective — the production
# default on the pallas impl ("auto"). Two measured dead ends recorded on
# the way: (a) composing the affine formula from standalone pallas calls
# costs a (B, L) <-> (L, B/128, 128) layout transpose around every op
# (1206 ms); (b) a separate flag/full-bit-reversal GATHER costs ~28-85 ms
# (gathers pay per row). On the compact impl (CPU tests) the flat graph
# compiles several minutes slower, so "auto" keeps the legacy scan there;
# the adversarial/interpret tests force the flat path explicitly.
#
# Reference hot path: bellperson Pippenger multiexp (SURVEY.md §2.4 L5,
# §3.1 HOTTEST).
AFFINE_LADDER = os.environ.get("MASP_MSM_AFFINE", "auto")
if AFFINE_LADDER in ("0", "1"):
    AFFINE_LADDER = AFFINE_LADDER == "1"
AFFINE_LEVELS = int(os.environ.get("MASP_MSM_AFFINE_LEVELS", "4"))


def _affine_on(fops) -> bool:
    if hasattr(fops, "add_points"):  # Edwards curves bring their own adds
        return False
    if AFFINE_LADDER == "auto":
        from masp_tpu.ops import field_jax as F

        return F.get_impl() == "pallas"
    return bool(AFFINE_LADDER)


def _coord_eq(fops, a, b):
    axes = tuple(range(-len(fops.coord_shape), 0))
    return jnp.all(a == b, axis=axes)


def _coord_sel(fops, cond, a, b):
    c = cond.reshape(cond.shape + (1,) * len(fops.coord_shape))
    return jnp.where(c != 0, a, b)


def _coord_neg(fops, y):
    # per-coefficient mod-q negation covers both Fq (..., L) and
    # Fq2 (..., 2, L) layouts: F.neg treats leading axes as batch
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops.field_jax import FQ

    return F.neg(FQ, y)


def _root_inv(fops, r):
    """Inverse of the (1, ...) product-tree root via the tiny-width Fermat
    chain (Fq2 reduces to one Fq inversion through the norm)."""
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops.field_jax import FQ

    if len(fops.coord_shape) == 1:
        return F.mont_inv_small(FQ, r)
    r0, r1 = r[..., 0, :], r[..., 1, :]
    norm = F.add(FQ, F.mont_mul(FQ, r0, r0), F.mont_mul(FQ, r1, r1))
    ni = F.mont_inv_small(FQ, norm)
    c0 = F.mont_mul(FQ, r0, ni)
    c1 = F.neg(FQ, F.mont_mul(FQ, r1, ni))
    return jnp.stack([c0, c1], axis=-2)


def _tree_batch_inv(fops, d):
    """Exact batched inversion of (w, ...) nonzero field elements: product
    tree up-sweep (w-1 muls, log depth), one tiny-width Fermat on the root,
    seeded down-sweep (2(w-1) muls, log depth). ~3 muls per lane."""
    w = d.shape[0]
    assert w & (w - 1) == 0, "pad lanes to a power of two"
    prods = [d]
    while prods[-1].shape[0] > 1:
        p = prods[-1]
        prods.append(fops.mul(p[0::2], p[1::2]))
    inv = _root_inv(fops, prods[-1])
    for p in reversed(prods[:-1]):
        ie = fops.mul(inv, p[1::2])
        io = fops.mul(inv, p[0::2])
        inv = jnp.stack([ie, io], axis=1).reshape(p.shape)
    return inv


def _affine_level(fops, p1, p2):
    """One ladder level of batch-affine additions. p* = (x, y, inf) with
    inf != 0 marking the identity; finite coords are canonical affine.
    Branch-free complete handling: chord add, tangent doubling (x1 == x2,
    y1 == y2), P + (-P) -> identity, identity pass-throughs. Exactly one
    batched inversion (one tiny Fermat) per call; 7 muls per lane.
    Identity lanes are normalized to (0, mont-1) so a later projective
    lift (Z = inf ? 0 : 1) yields the canonical (0 : 1 : 0)."""
    x1, y1, f1 = p1
    x2, y2, f2 = p2
    mul, add_, sub_ = fops.mul, fops.add, fops.sub
    one = fops.one_like(x1)
    i1 = f1 != 0
    i2 = f2 != 0
    fin = jnp.logical_and(~i1, ~i2)
    xeq = _coord_eq(fops, x1, x2)
    yneg = _coord_eq(fops, y1, _coord_neg(fops, y2))
    res_inf = jnp.logical_and(fin, jnp.logical_and(xeq, yneg))
    use_dbl = jnp.logical_and(fin, jnp.logical_and(xeq, ~yneg))
    sq1 = mul(x1, x1)
    n_eff = _coord_sel(
        fops, use_dbl, add_(add_(sq1, sq1), sq1), sub_(y2, y1)
    )
    live = jnp.logical_and(fin, ~res_inf)
    d_eff = _coord_sel(fops, use_dbl, add_(y1, y1), sub_(x2, x1))
    d_eff = _coord_sel(fops, live, d_eff, one)
    lam = mul(n_eff, _tree_batch_inv(fops, d_eff))
    x3 = sub_(sub_(mul(lam, lam), x1), x2)
    y3 = sub_(mul(lam, sub_(x1, x3)), y1)
    xo = _coord_sel(fops, i1, x2, _coord_sel(fops, i2, x1, x3))
    yo = _coord_sel(fops, i1, y2, _coord_sel(fops, i2, y1, y3))
    fo = jnp.logical_or(jnp.logical_and(i1, i2), res_inf).astype(jnp.int32)
    xo = _coord_sel(fops, fo, fops.zeros_like(xo), xo)
    yo = _coord_sel(fops, fo, one, yo)
    return xo, yo, fo


def _fold_halves(arr, n_windows: int):
    """Per-window fold split: arr (W*n_l, ...) -> two (W*n_l/2, ...) halves
    pairing position p with p + n_l/2 inside each window. Under the partial
    bit-reversed storage (see _sigma below) this pairs sorted elements
    (2j, 2j+1) for the affine levels — and in kernel layout it is a
    contiguous slice, not a stride-2 shuffle."""
    nl = arr.shape[0] // n_windows
    r = arr.reshape((n_windows, nl) + arr.shape[1:])
    h = nl // 2
    e = r[:, :h].reshape((n_windows * h,) + arr.shape[1:])
    o = r[:, h:].reshape((n_windows * h,) + arr.shape[1:])
    return e, o


def _adj_pairs(arr):
    """Adjacent pairing (2i, 2i+1) — the ladder levels ABOVE the affine
    segment, where storage is back in natural sorted order."""
    half = arr.shape[0] // 2
    r = arr.reshape((half, 2) + arr.shape[1:])
    return r[:, 0], r[:, 1]


def _sigma(arr2d, levels: int, kbits: int):
    """Partial bit-reversal of the position axis of (W, N) arrays, as a
    multi-axis transpose (no gather): element e = (hi << kb) | lo moves to
    position (rev_kb(lo) << (levels - kb)) | hi. The first kbits ladder
    levels then pair (2j, 2j+1) as CONTIGUOUS half-folds (kernel-layout
    friendly), and levels >= kbits are back in natural order (adjacent
    pairing, identity query indexing). A 16 MB i32 gather for the full
    reversal measured ~20-25 ms on v5e; this transpose is ~free."""
    if kbits == 0:
        return arr2d
    w = arr2d.shape[0]
    n = arr2d.shape[1]
    r = arr2d.reshape((w, n >> kbits) + (2,) * kbits)
    # output axis order: (w, lo bit0, lo bit1, ..., lo bit kb-1, hi)
    perm_axes = (0,) + tuple(range(kbits + 1, 1, -1)) + (1,)
    return jnp.transpose(r, perm_axes).reshape(w, n)


def _bitrev_dyn(x, nbits: int):
    """Bit-reverse traced int32 values over nbits."""
    out = jnp.zeros_like(x)
    for i in range(nbits):
        out = out | (((x >> i) & 1) << (nbits - 1 - i))
    return out


def _node_pos(idx, l: int, levels: int, kbits: int):
    """Storage position of node ``idx`` at level ``l`` under the partial
    bit-reversed layout: natural above the affine segment, low-bit
    reversed within it."""
    if l >= kbits:
        return idx
    kb = kbits - l
    lo = idx & ((1 << kb) - 1)
    hi = idx >> kb
    return (_bitrev_dyn(lo, kb) << (levels - l - kb)) | hi


def window_buckets_flat(fops, points_packed, digits, c: int,
                        signed: bool = False, affine_levels: int | None = None):
    """window_buckets with the window axis flattened into the lane axis and
    a batch-affine lower ladder (see the design note above AFFINE_LADDER).

    Storage is per-window PARTIALLY BIT-REVERSED over the low K bits
    (_sigma — a transpose, not a gather): the K affine levels pair
    positions (p, p + n_l/2) as contiguous half-folds (kernel-layout
    friendly), while levels >= K sit in natural order with adjacent
    pairing. Node j of level l < K sits at position _node_pos(j, l); the
    prefix queries map their indices through it. The infinity flag rides
    the row gather as a 49th column (a separate 4.19M-row flag gather
    measured ~28-85 ms — gathers cost per row, not per byte).

    Per level this runs ONE batched affine add across all windows (so the
    per-level product-tree root costs one Fermat total), stores the level's
    nodes (affine for levels <= K, projective above), then answers all
    windows' bucket-boundary prefix queries W*B-wide. On the pallas impl
    the affine levels run entirely in kernel layout (fused pre/post
    kernels, kernels/field_kernels.klay_affine_level) — composing them
    from standalone calls measured 8x slower (layout transposes around
    every op). Bit-identical to window_buckets. Precondition: rows are
    encoded affine points or identity pads (Z in {0, mont-1}) — the same
    precondition the round-4 leaf-specialized add established for
    parameter queries."""
    from masp_tpu.ops import field_jax as F

    N = points_packed.shape[0]
    n_windows = digits.shape[1]
    B = (1 << (c - 1)) + 1 if signed else 1 << c
    levels = (N - 1).bit_length()
    assert N == 1 << levels, "pad N to a power of two"
    K = AFFINE_LEVELS if affine_levels is None else affine_levels
    K = max(0, min(K, levels))
    cshape = fops.coord_shape
    k = int(np.prod(cshape))
    use_klay = (
        len(cshape) == 1
        and F.get_impl() == "pallas"
        # kernel layout needs whole (TB*128)-lane groups with no padding
        and (n_windows * N) % (128 * 8) == 0
    )

    if signed:
        keys = jnp.abs(digits).T.astype(jnp.int32)
        signs = (digits < 0).T.astype(jnp.int32)
    else:
        keys = digits.T.astype(jnp.int32)
        signs = None
    iota = jnp.arange(N, dtype=jnp.int32)
    sorted_keys, perm = jax.vmap(lambda kk: jax.lax.sort_key_val(kk, iota))(keys)
    kvals = jnp.arange(B, dtype=jnp.int32)
    bounds = jax.vmap(lambda sk: jnp.searchsorted(sk, kvals, side="right"))(
        sorted_keys
    ).astype(jnp.int32)

    like = _unpack(fops, points_packed)[0]

    # affine source coords + infinity flag packed as one extra row column,
    # so ONE row gather fetches both (Z in {0, mont-1} by contract)
    z_src = points_packed[:, 2 * k :].reshape((N,) + cshape)
    inf_src = fops.is_zero(z_src).astype(jnp.uint32)
    src = jnp.concatenate(
        [points_packed[:, : 2 * k], inf_src[:, None]], axis=1
    )

    # storage order: partial bit-reversal over the K affine levels,
    # applied to the (traced) permutation as a transpose
    perm = _sigma(perm, levels, K)

    perm_flat = perm.reshape(n_windows * N)
    rows = jnp.take(src, perm_flat, axis=0)  # (W*N, 2k+1)
    f = rows[:, 2 * k].astype(jnp.int32)
    x = rows[:, :k].reshape((-1,) + cshape)
    y = rows[:, k : 2 * k].reshape((-1,) + cshape)
    if signed:
        # signs are indexed by ORIGINAL point index: gather through the
        # storage-order permutation
        sgs = jnp.take_along_axis(signs, perm, axis=1).reshape(n_windows * N)
        y = _coord_sel(fops, sgs, _coord_neg(fops, y), y)

    # up-sweep: affine levels 0..K, projective above. The fold split stays
    # inside each window for every level below the per-window root. Node
    # levels are tagged ("bm", x, y, f) batch-major or ("kl", kx, ky, kf)
    # kernel-layout — the query phase gathers kernel-layout levels with an
    # axis-1 take (a per-level batch-major dump costs ~3-6 ms of layout
    # copies; the 8192-row query gather is ~free either way).
    aff_nodes = [("bm", x, y, f)]
    if use_klay and K > 0:
        from masp_tpu.kernels import field_kernels as FK

        # one conversion into kernel layout for the whole affine segment
        kx = FK.to_kernel_layout(x, FK.TB)[0]
        ky = FK.to_kernel_layout(y, FK.TB)[0]
        kf = f.astype(jnp.uint32).reshape(-1, FK.LANE)
        n_k = 0
        for l in range(K):
            n_l = N >> l
            # klay fold needs >= 2 whole lane groups per window half and
            # whole flag rows; fall back to batch-major below that
            if n_l < 2 * FK.LANE or (n_windows * n_l // 2) % (
                FK.TB * FK.LANE
            ):
                break
            kxe, kxo = _fold_halves_klay(kx, n_windows)
            kye, kyo = _fold_halves_klay(ky, n_windows)
            kfe, kfo = _fold_halves_flag(kf, n_windows)
            kx, ky, kf = FK.klay_affine_level(kxe, kye, kfe, kxo, kyo, kfo)
            aff_nodes.append(("kl", kx, ky, kf))
            n_k += 1
        if n_k == K:
            w_l = n_windows * (N >> K)
            cur = (
                FK.from_kernel_layout(kx, w_l, cshape),
                FK.from_kernel_layout(ky, w_l, cshape),
                kf.reshape(-1).astype(jnp.int32),
            )
        else:
            tag, kx_, ky_, kf_ = aff_nodes[-1]
            if tag == "kl":
                w_l = n_windows * (N >> n_k)
                cur = (
                    FK.from_kernel_layout(kx_, w_l, cshape),
                    FK.from_kernel_layout(ky_, w_l, cshape),
                    kf_.reshape(-1).astype(jnp.int32),
                )
            else:
                cur = (kx_, ky_, kf_)
            for _l in range(n_k, K):
                xe, xo = _fold_halves(cur[0], n_windows)
                ye, yo = _fold_halves(cur[1], n_windows)
                fe, fo = _fold_halves(cur[2], n_windows)
                cur = _affine_level(fops, (xe, ye, fe), (xo, yo, fo))
                aff_nodes.append(("bm",) + cur)
    else:
        cur = (x, y, f)
        for _l in range(K):
            xe, xo = _fold_halves(cur[0], n_windows)
            ye, yo = _fold_halves(cur[1], n_windows)
            fe, fo = _fold_halves(cur[2], n_windows)
            cur = _affine_level(fops, (xe, ye, fe), (xo, yo, fo))
            aff_nodes.append(("bm",) + cur)
    xK, yK, fK = cur
    one = fops.one_like(xK)
    curp = (xK, yK, _coord_sel(fops, fK, fops.zeros_like(xK), one))
    proj_nodes = {K: curp}
    for l in range(K, levels):
        # above the affine segment storage is natural order: adjacent pairs
        e = []
        o = []
        for cc in curp:
            ee, oo = _adj_pairs(cc)
            e.append(ee)
            o.append(oo)
        curp = W.g_add(fops, tuple(e), tuple(o))
        proj_nodes[l + 1] = curp

    # exclusive-prefix queries at the B bucket boundaries, all windows wide
    acc = _traced_identity(fops, like, (n_windows, B))
    warange = jnp.arange(n_windows, dtype=jnp.int32)[:, None]
    for l in range(levels + 1):
        n_l = N >> l
        idx = 2 * (bounds >> (l + 1))
        bit = (bounds >> l) & 1
        pos = _node_pos(jnp.minimum(idx, n_l - 1), l, levels, K)
        gidx = (warange * n_l + pos).reshape(-1)
        if l < len(aff_nodes):
            tag, nx, ny, nf = aff_nodes[l]
            if tag == "kl":
                Lr = nx.shape[0]
                gx = jnp.transpose(
                    jnp.take(nx.reshape(Lr, -1), gidx, axis=1)
                ).reshape((n_windows, B) + cshape)
                gy = jnp.transpose(
                    jnp.take(ny.reshape(Lr, -1), gidx, axis=1)
                ).reshape((n_windows, B) + cshape)
                gf = jnp.take(nf.reshape(-1), gidx).reshape(
                    n_windows, B
                ).astype(jnp.int32)
            else:
                gx = jnp.take(nx, gidx, axis=0).reshape(
                    (n_windows, B) + cshape
                )
                gy = jnp.take(ny, gidx, axis=0).reshape(
                    (n_windows, B) + cshape
                )
                gf = jnp.take(nf, gidx).reshape(n_windows, B)
            onep = fops.one_like(gx)
            gath = (gx, gy, _coord_sel(fops, gf, fops.zeros_like(gx), onep))
        else:
            gath = tuple(
                jnp.take(cc, gidx, axis=0).reshape((n_windows, B) + cshape)
                for cc in proj_nodes[l]
            )
        added = W.g_add(fops, acc, gath)
        acc = W.point_select(bit, added, acc)

    ident_1 = _traced_identity(fops, like, (n_windows, 1))
    qprev = tuple(
        jnp.concatenate([i1, cc[:, :-1]], axis=1)
        for i1, cc in zip(ident_1, acc)
    )
    return W.g_add(fops, acc, _g_neg(fops, qprev))


def _fold_halves_klay(arr, n_windows: int):
    """_fold_halves on a kernel-layout (L, B1, 128) coord array: the
    per-window halves are contiguous runs of lane groups."""
    L, B1, lane = arr.shape
    nl1 = B1 // n_windows
    r = arr.reshape(L, n_windows, nl1, lane)
    h = nl1 // 2
    e = r[:, :, :h].reshape(L, B1 // 2, lane)
    o = r[:, :, h:].reshape(L, B1 // 2, lane)
    return e, o


def _fold_halves_flag(arr, n_windows: int):
    """_fold_halves on a (B1, 128) flag array."""
    B1, lane = arr.shape
    nl1 = B1 // n_windows
    r = arr.reshape(n_windows, nl1, lane)
    h = nl1 // 2
    return (
        r[:, :h].reshape(B1 // 2, lane),
        r[:, h:].reshape(B1 // 2, lane),
    )


def _pow2_groups(w: int) -> list[int]:
    """Decompose a window count into descending powers of two (22 ->
    [16, 4, 2]): the BGMW merged MSM needs power-of-two entry counts for
    the halving ladder, and padding 22*N up to 32*N would cost back the
    adds the tables saved."""
    out = []
    bit = 1 << (w.bit_length() - 1)
    while w:
        if w >= bit:
            out.append(bit)
            w -= bit
        bit >>= 1
    return out


def build_bgmw_table(fops, points_packed, c: int):
    """Fixed-base (BGMW) table for a parameter query: slab w holds
    [2^(c*w)]P_i in affine-or-identity encoding (Z in {0, mont-1}, so the
    ladder's leaf-level specialized add stays valid). Returns
    (W*N, rowlen) rows, slab-major.

    Rationale: Groth16 proving MSMs run over FIXED parameter points, so
    per-window point multiples can be precomputed once per params load.
    With the table, the W-window Pippenger collapses to single-window
    merged MSMs over the (point, window) pairs: ceil(255/c)/ceil(255/8)
    fewer tree adds at c > 8 and no Horner doubling chain. G1 only (the
    is_zero identity test below assumes a rank-1 coordinate)."""
    n_windows = n_windows_for(c)
    N = points_packed.shape[0]
    rowlen = points_packed.shape[1]

    def body(w, carry):
        cur_packed, table = carry
        cur = _unpack(fops, cur_packed)

        def dbl(_, p):
            return W.g_add(fops, p, p)

        cur = jax.lax.fori_loop(0, c, dbl, cur)
        cur_packed = pack_points(cur)
        table = jax.lax.dynamic_update_slice(
            table, cur_packed[None], (w, 0, 0)
        )
        return cur_packed, table

    table0 = jnp.zeros((n_windows - 1, N, rowlen), points_packed.dtype)
    _, table = jax.lax.fori_loop(
        0, n_windows - 1, body, (points_packed, table0)
    )
    # one batched affinization for every slab: Z in {0, mont-1} afterwards
    X, Y, Z = _unpack(fops, table.reshape((n_windows - 1) * N, rowlen))
    nonzero = jnp.logical_not(fops.is_zero(Z)).astype(jnp.int32)
    zinv = fops.batch_inv(Z)
    x = fops.mul(X, zinv)
    y = fops.mul(Y, zinv)
    one = fops.one_like(x)
    zero = fops.zeros_like(x)
    aff = W.point_select(nonzero, (x, y, one), (zero, one, zero))
    return jnp.concatenate(
        [points_packed, pack_points(aff)], axis=0
    )


def bgmw_msm_from_limbs(fops, table_rows, limbs16, c: int):
    """sum_i [s_i] P_i against a build_bgmw_table table: merged
    single-window MSMs over the (point, window) pairs, grouped into
    power-of-two window counts; the slab points carry the 2^(c*w) window
    weights, so there is no Horner chain."""
    N = limbs16.shape[0]
    digits = windows_from_limbs(limbs16, c)  # (N, W)
    Wn = digits.shape[1]
    assert table_rows.shape[0] == Wn * N, (table_rows.shape, Wn, N)
    total = None
    off = 0
    for g in _pow2_groups(Wn):
        d = digits[:, off : off + g].T.reshape(g * N, 1)
        rows_g = jax.lax.dynamic_slice_in_dim(table_rows, off * N, g * N, 0)
        like = _unpack(fops, rows_g)[0]
        bk = window_buckets(fops, rows_g, d, c)
        pt = bucket_reduce_horner(fops, bk, c, like)
        if total is None:
            total = pt
        else:
            comb = W.g_add(
                fops,
                tuple(t[None] for t in total),
                tuple(p[None] for p in pt),
            )
            total = tuple(x[0] for x in comb)
        off += g
    return total


def masked_sum(fops, points_packed, bits):
    """sum_i [b_i] P_i for b_i in {0, 1}: the degenerate MSM the prover's
    boolean-split queries reduce to. No sort, no gather, no buckets —
    select identity where the bit is 0, then one dyadic halving ladder
    (N-1 complete adds, every level a full-width batched kernel)."""
    N = points_packed.shape[0]
    levels = (N - 1).bit_length()
    assert N == 1 << levels, "pad N to a power of two"
    cur = _unpack(fops, points_packed)
    like = cur[0]
    ident = _traced_identity(fops, like, (N,))
    cur = W.point_select(bits.reshape(N).astype(jnp.int32), cur, ident)
    for _l in range(levels):
        n_half = cur[0].shape[0] // 2
        paired = [cc.reshape((n_half, 2) + cc.shape[1:]) for cc in cur]
        e = tuple(pc[:, 0] for pc in paired)
        o = tuple(pc[:, 1] for pc in paired)
        # leaf level: encoded points / identity pads have Z in {0, mont1}
        cur = (W.g_add01 if _l == 0 else W.g_add)(fops, e, o)
    return tuple(c[0] for c in cur)


def sorted_msm_batch(fops, points_packed, digits, c: int, signed: bool = False):
    """Q independent MSMs in one program: points_packed (Q, N, rowlen),
    digits (Q, N, W) -> coords with a leading Q axis.

    Batching the MSMs (the prover's four same-size G1 queries, or a
    proof batch) keeps the small upper ladder levels and the bucket
    reduction — tiny kernels when run alone — filled Q-wide."""
    return jax.vmap(lambda pk, d: sorted_msm(fops, pk, d, c, signed=signed))(
        points_packed, digits
    )


__all__ = [
    "sorted_msm", "sorted_msm_batch", "sorted_msm_from_limbs",
    "window_buckets", "window_buckets_flat", "pack_points",
    "bucket_reduce_horner", "windows_from_limbs", "n_windows_for",
    "masked_sum",
]

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


def bucket_reduce_horner(fops, buckets, c: int, like):
    """(W, B, ...) bucket sums -> single projective point (no batch axis).

    window[w] = sum_k k * bucket[w, k] via the running-suffix trick, then
    Horner combine over windows with c doublings between them."""
    bx, by, bz = buckets
    n_windows = bx.shape[0]
    B = bx.shape[1]

    # the fori path's B-1 sequential width-W steps lose badly once B is
    # large and W small (the BGMW merged window: W=1, B=4096 -> 8190
    # width-1 steps); the suffix scan's log2(B) wide steps win there
    if WIDE_REDUCE or B >= 1024:
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
    return bucket_reduce_horner(fops, buckets, c, like)


def sorted_msm_from_limbs(fops, points_packed, limbs16, c: int,
                          signed: bool = True):
    """sorted_msm with in-graph digit extraction: limbs16 is the (N, 16)
    canonical 16-bit-limb scalar array (the native field layout — a
    reinterpret of the witness u64 words, no host digit marshalling).
    Balanced signed digits by default."""
    digits = windows_from_limbs(limbs16, c, signed=signed)
    return sorted_msm(fops, points_packed, digits, c, signed=signed)


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
    "window_buckets", "pack_points", "bucket_reduce_horner",
    "windows_from_limbs", "n_windows_for", "masked_sum",
]

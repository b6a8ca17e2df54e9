#!/usr/bin/env python
"""Experiment: Montgomery multiplication with the reduction on the MXU.

Idea (round 4): in CIOS, ~half the VPU work multiplies by FIXED constants
(m = T_lo * N' mod R, then m * N) — multiplication by a fixed bignum is a
linear map over limbs, i.e. a matmul over the batch, and v5e's MXU does
int8 x int8 -> int32 exactly (probed: the ONLY working integer dot).
Scheme:

  - product phase a*b stays VPU schoolbook (both operands vary);
  - normalize the 49 lazy columns -> 48 true 16-bit limbs of T;
  - m = T_lo * N' mod 2^384 as TWO int8 dots: operands recentred to
    [-128,127] (chunk - 128), the cross terms recovered with a {0,1}
    band-matrix dot and a constant vector (exact);
  - m * N likewise; then T + m*N >> 384 with two carry chains.

The dots need the chunk axis contiguous, so the kernel relayouts
(stack/reshape) between limb-major rows and (K, B) matrices.

This tool checks bit-exactness against F.mont_mul on random inputs and
slope-times both variants at 2^17. If it wins it moves into
kernels/field_kernels.py as the production path.
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from masp_tpu.kernels import field_kernels as K  # noqa: E402
from masp_tpu.ops import field_jax as F  # noqa: E402
from masp_tpu.ops.field_jax import FQ  # noqa: E402

TB = K.TB
LANE = K.LANE
MASK = 0xFFFF


def _mxu_consts(spec):
    """Host-side constant matrices for the two reduction dots (int8)."""
    L = spec.L                     # 24 16-bit limbs
    L8 = 2 * L                     # 48 8-bit chunks
    R = 1 << (16 * L)
    N = 0
    for i, limb in enumerate(spec.N):
        N |= int(limb) << (16 * i)
    NPRIME = (-pow(N, -1, R)) % R  # N' = -N^{-1} mod 2^384

    def chunks8(x, n):
        return [(x >> (8 * i)) & 0xFF for i in range(n)]

    np8 = chunks8(NPRIME, L8)
    n8 = chunks8(N, L8)

    # dot 1: m_lazy[k] = sum_{i+j=k, i,j<48, k<48} t8[i]*np8[j]
    #      = dot(M1t, t8c) + 128*dot(B1, t8c) + C1[k]
    M1t = np.zeros((L8, L8), dtype=np.int64)   # [k, i] = np8[k-i]
    B1 = np.zeros((L8, L8), dtype=np.int64)
    C1 = np.zeros((L8,), dtype=np.int64)
    for k in range(L8):
        for i in range(k + 1):
            j = k - i
            M1t[k, i] = np8[j] - 128
            B1[k, i] = 1
            C1[k] += 128 * (np8[j] - 128) + 128 * 128
    # dot 2: mn_lazy[k] = sum_{i+j=k, i,j<48} m8[i]*n8[j], k < 96
    M2t = np.zeros((2 * L8, L8), dtype=np.int64)
    B2 = np.zeros((2 * L8, L8), dtype=np.int64)
    C2 = np.zeros((2 * L8,), dtype=np.int64)
    for k in range(2 * L8):
        for i in range(L8):
            j = k - i
            if 0 <= j < L8:
                M2t[k, i] = n8[j] - 128
                B2[k, i] = 1
                C2[k] += 128 * (n8[j] - 128) + 128 * 128
    # C vectors as (K, 1) so they broadcast over the batch axis in-kernel
    return {
        "M1t": jnp.asarray(M1t.astype(np.int8)),
        "B1": jnp.asarray(B1.astype(np.int8)),
        "C1": jnp.asarray(C1.astype(np.int32).reshape(-1, 1)),
        "M2t": jnp.asarray(M2t.astype(np.int8)),
        "B2": jnp.asarray(B2.astype(np.int8)),
        "C2": jnp.asarray(C2.astype(np.int32).reshape(-1, 1)),
    }


_CONST_KEYS = ("M1t", "B1", "C1", "M2t", "B2", "C2")


def rows_mont_mul_mxu(spec, consts, a, b):
    """Montgomery product; reduction dots on the MXU. Row-list in/out."""
    L = spec.L
    L8 = 2 * L

    # --- product phase (VPU schoolbook, as production) ---
    cols = [None] * (2 * L + 1)
    for i in range(L):
        ai = a[i]
        for j in range(L):
            p = ai * b[j]
            lo = p & MASK
            hi = p >> 16
            cols[i + j] = lo if cols[i + j] is None else cols[i + j] + lo
            cols[i + j + 1] = (
                hi if cols[i + j + 1] is None else cols[i + j + 1] + hi
            )

    # --- normalize to 48 true 16-bit limbs of T (T < 2^768) ---
    t16 = []
    c = jnp.zeros_like(cols[0])
    for i in range(2 * L):
        v = cols[i] + c
        t16.append(v & MASK)
        c = v >> 16
    # The 2^768 coefficient (cols[2L] + final carry) is provably zero for
    # inputs < 2^384 (T = a*b < 2^768), so the chain stops at 48 limbs.

    tb_shape = a[0].shape  # (TB, 128)
    Bflat = tb_shape[0] * tb_shape[1]

    def to_mat_i8(chunks):
        """list of K (TB,128) u32 arrays with values <256 -> (K, B) int8
        recentred by -128."""
        m = jnp.stack([ch.astype(jnp.int32) - 128 for ch in chunks])
        return m.reshape(len(chunks), Bflat).astype(jnp.int8)

    def dots(mat_i8, Mt, Bt, C):
        d1 = jax.lax.dot_general(
            Mt, mat_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        d2 = jax.lax.dot_general(
            Bt, mat_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return d1 + (d2 << 7) + C

    # --- m = T_lo * N' mod 2^384 ---
    t8_lo = []
    for i in range(L):
        t8_lo.append(t16[i] & 0xFF)
        t8_lo.append(t16[i] >> 8)
    m_lazy = dots(to_mat_i8(t8_lo), consts["M1t"], consts["B1"], consts["C1"])
    # back to row-major chunks, normalize to true 8-bit limbs
    m_rows = [
        m_lazy[k].reshape(tb_shape).astype(jnp.uint32) for k in range(L8)
    ]
    m8 = []
    c = jnp.zeros_like(m_rows[0])
    for k in range(L8):
        v = m_rows[k] + c
        m8.append(v & 0xFF)
        c = v >> 8
    # (final carry drops: mod 2^384)

    # --- mn = m * N (96 chunks) ---
    mn_lazy = dots(to_mat_i8(m8), consts["M2t"], consts["B2"], consts["C2"])
    mn_rows = [
        mn_lazy[k].reshape(tb_shape).astype(jnp.uint32) for k in range(2 * L8)
    ]

    # --- (T + mN) >> 384 ---
    # low 48 8-bit positions: value ≡ 0 mod 2^384; chain for the carry only
    c = jnp.zeros_like(mn_rows[0])
    for k in range(L8):
        tchunk = t16[k // 2] >> 8 if k % 2 else t16[k // 2] & 0xFF
        c = (mn_rows[k] + tchunk + c) >> 8
    # high 48 positions + top: chain, pairs fold to 16-bit limbs
    out = []
    for i in range(L):
        lo_k, hi_k = 2 * i, 2 * i + 1
        v0 = mn_rows[L8 + lo_k] + (t16[L + i] & 0xFF) + c
        lo8 = v0 & 0xFF
        c = v0 >> 8
        v1 = mn_rows[L8 + hi_k] + (t16[L + i] >> 8) + c
        hi8 = v1 & 0xFF
        c = v1 >> 8
        out.append(lo8 | (hi8 << 8))

    # conditional subtract N (canonical output, as production)
    return K.rows_carry_reduce(spec, out)


def _mont_mxu_kernel(spec, a_ref, b_ref,
                     m1_ref, b1_ref, c1_ref, m2_ref, b2_ref, c2_ref, o_ref):
    a = [a_ref[i] for i in range(spec.L)]
    b = [b_ref[i] for i in range(spec.L)]
    consts = {
        "M1t": m1_ref[:], "B1": b1_ref[:], "C1": c1_ref[:],
        "M2t": m2_ref[:], "B2": b2_ref[:], "C2": c2_ref[:],
    }
    out = rows_mont_mul_mxu(spec, consts, a, b)
    for i, r in enumerate(out):
        o_ref[i] = r


def main():
    on_tpu = jax.default_backend() == "tpu"
    F.set_impl("pallas" if on_tpu else "compact")
    print("backend:", jax.default_backend(), flush=True)
    spec = FQ
    consts = _mxu_consts(spec)

    B = 1 << 17
    rng = np.random.default_rng(11)
    N_int = 0
    for i, limb in enumerate(spec.N):
        N_int |= int(limb) << (16 * i)
    # random full-range field elements
    a_int = [int.from_bytes(rng.bytes(48), "little") % N_int for _ in range(256)]
    b_int = [int.from_bytes(rng.bytes(48), "little") % N_int for _ in range(256)]

    def enc(vals, n):
        arr = np.zeros((n, spec.L), dtype=np.uint32)
        for r, v in enumerate(vals):
            for i in range(spec.L):
                arr[r, i] = (v >> (16 * i)) & 0xFFFF
        return arr

    a_small = jnp.asarray(enc(a_int, 256))
    b_small = jnp.asarray(enc(b_int, 256))

    def run_mxu(a2, b2):
        ak, Bn = K.to_kernel_layout(a2, TB)
        bk, _ = K.to_kernel_layout(b2, TB)
        kern = partial(_mont_mxu_kernel, spec)
        carrs = [consts[k] for k in _CONST_KEYS]
        cspecs = [
            pl.BlockSpec(c.shape, lambda i: tuple(0 for _ in c.shape))
            for c in carrs
        ]
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(ak.shape, jnp.uint32),
            grid=(ak.shape[1] // TB,),
            in_specs=[K._block_spec(spec.L, TB)] * 2 + cspecs,
            out_specs=K._block_spec(spec.L, TB),
            interpret=not on_tpu,
        )(ak, bk, *carrs)
        return K.from_kernel_layout(out, Bn, (spec.L,))

    got = np.asarray(jax.jit(run_mxu)(a_small, b_small))
    want = np.asarray(F.mont_mul(spec, a_small, b_small))
    eq = np.array_equal(got, want)
    print("mxu mont_mul exact vs production:", eq, flush=True)
    if not eq:
        bad = np.nonzero(np.any(got != want, axis=1))[0]
        print("first mismatches:", bad[:5])
        i = int(bad[0])
        gv = sum(int(got[i, k]) << (16 * k) for k in range(spec.L))
        wv = sum(int(want[i, k]) << (16 * k) for k in range(spec.L))
        print(f"got  {gv:#x}")
        print(f"want {wv:#x}")
        return 1

    # --- slope timing at 2^17 ---
    a_big = jnp.asarray(rng.integers(0, 1 << 16, (B, spec.L), dtype=np.uint32))
    b_big = jnp.asarray(rng.integers(0, 1 << 16, (B, spec.L), dtype=np.uint32))

    def force(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.ravel()[:1])

    def timeit(fn, *args, iters=5):
        out = fn(*args)
        force(out)
        ts = []
        for _ in range(iters):
            t0 = time.time()
            force(fn(*args))
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    def make_loop(mulfn, Krep):
        def run(a, b):
            def body(i, x):
                return mulfn(x, b)
            return jax.lax.fori_loop(0, Krep, body, a)
        return jax.jit(run)

    def mxu_mul(a2, b2):
        return run_mxu(a2, b2)

    def prod_mul(a2, b2):
        return F.mont_mul(spec, a2, b2)

    for name, mf in (("production", prod_mul), ("mxu", mxu_mul)):
        t1 = timeit(make_loop(mf, 8), a_big, b_big)
        t2 = timeit(make_loop(mf, 24), a_big, b_big)
        per = (t2 - t1) / 16
        print(f"{name:12s} {per*1e3:8.3f} ms per 2^17 muls "
              f"({B/per/1e6:.0f} M muls/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Kernel-level microbenchmarks for the MSM roofline analysis (round 4).

The axon relay costs ~25-80 ms per dispatch, so every measurement here is
a SLOPE: the same jitted program run with K1 and K2 internal repetitions,
per-op time = (t(K2) - t(K1)) / (K2 - K1). Answers, on the real chip:

  1. pallas G1 complete-add throughput (adds/s) at full width — the
     MSM's dominant op — vs the VPU op-count model;
  2. pallas Fq mont_mul throughput standalone;
  3. whether Mosaic supports int8 x int8 -> int32 jnp.dot on the MXU
     inside a pallas kernel (the fixed-matrix Montgomery-reduction idea)
     and its throughput;
  4. full sorted-MSM timing at 2^17 for a c sweep (VERDICT r3 item 5).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(out):
    """Fetch one element to host: through the axon relay,
    block_until_ready returns before execution completes — only a
    host materialization actually synchronizes."""
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[:1])  # on-device slice, 1-element transfer


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    _force(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _force(out)
        ts.append(time.time() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"{name:44s} median {med*1e3:9.3f} ms  (min {ts[0]*1e3:.3f})",
          flush=True)
    return med


def slope(name, make_fn, k1, k2, unit_ops, *args, iters=5):
    """Per-op time from two repetition counts of the same program."""
    f1, f2 = make_fn(k1), make_fn(k2)
    t1 = timeit(f"{name} xK={k1}", f1, *args, iters=iters)
    t2 = timeit(f"{name} xK={k2}", f2, *args, iters=iters)
    per = (t2 - t1) / (k2 - k1)
    rate = unit_ops / per
    print(f"  -> {per*1e3:.3f} ms per rep; {rate/1e6:.2f} M ops/s "
          f"(dispatch+const ~{max(t1 - per*k1, 0)*1e3:.1f} ms)", flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    from masp_tpu.ops import field_jax as F

    on_tpu = jax.default_backend() == "tpu"
    F.set_impl("pallas" if on_tpu else "compact")
    print("backend:", jax.default_backend(), "impl:", F.get_impl(), flush=True)

    from masp_tpu.curves.bls12_381 import G1
    from masp_tpu.ops import msm_sorted as MS
    from masp_tpu.ops import weierstrass_jax as W

    rng = np.random.default_rng(7)

    N = 1 << 17
    p = G1.generator() * 987654321
    rows = np.concatenate(
        [np.tile(np.asarray(c), (N, 1)) for c in W.encode_g1_points([p])], axis=1
    )
    rows_dev = jax.device_put(jnp.asarray(rows))

    # --- 1. one full-width add level (2^16 adds), slope over K reps ----------
    def make_levels(K):
        def run(pk):
            def body(i, acc):
                x = pk ^ i.astype(jnp.uint32)  # break CSE; cost-neutral
                cur = MS._unpack(W.G1Ops, x)
                nh = cur[0].shape[0] // 2
                paired = [c.reshape((nh, 2) + c.shape[1:]) for c in cur]
                out = W.g_add(W.G1Ops, tuple(pc[:, 0] for pc in paired),
                              tuple(pc[:, 1] for pc in paired))
                return acc + out[0][0, 0]
            return jax.lax.fori_loop(0, K, body, jnp.uint32(0))
        return jax.jit(run)

    per_level = slope("G1 add level (2^16 adds)", make_levels, 2, 6,
                      N // 2, rows_dev)
    print(f"  == {(N//2)/per_level/1e6:.2f} M G1 adds/s", flush=True)

    # --- 2. Fq mont_mul slope -------------------------------------------------
    from masp_tpu.ops.field_jax import FQ

    B = 1 << 17
    a = jnp.asarray(rng.integers(0, 1 << 16, (B, FQ.L), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (B, FQ.L), dtype=np.uint32))

    def make_mul(K):
        def run(a, b):
            def body(i, x):
                return F.mont_mul(FQ, x, b)
            return jax.lax.fori_loop(0, K, body, a)
        return jax.jit(run)

    per_mul = slope("Fq mont_mul @2^17", make_mul, 8, 24, B, a, b)
    print(f"  == {B/per_mul/1e6:.2f} M Fq muls/s", flush=True)

    # --- 3. int8 MXU dot in pallas: correctness + throughput -------------------
    from jax.experimental import pallas as pl

    M_, K_, NN = 1024, 48, 96
    x8 = jnp.asarray(rng.integers(0, 127, (M_, K_), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(0, 127, (K_, NN), dtype=np.int8))

    def dot_kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    try:
        def run_dot(x, w):
            return pl.pallas_call(
                dot_kernel,
                out_shape=jax.ShapeDtypeStruct((M_, NN), jnp.int32),
                interpret=not on_tpu,
            )(x, w)

        got = np.asarray(jax.jit(run_dot)(x8, w8))
        want = np.asarray(x8, dtype=np.int32) @ np.asarray(w8, dtype=np.int32)
        ok = np.array_equal(got, want)
        print(f"int8 dot in pallas: {'OK (exact)' if ok else 'WRONG RESULT'}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"int8 dot in pallas: FAILED ({type(e).__name__}: {e})",
              flush=True)

    # int8 matmul throughput at the Montgomery-reduction shape, inside one
    # kernel loop: (8*128, 48) @ (48, 96) per rep
    def mm_loop_kernel(K):
        def kern(x_ref, w_ref, o_ref):
            def body(i, acc):
                return acc + jax.lax.dot_general(
                    x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            o_ref[:] = jax.lax.fori_loop(0, K, body,
                                         jnp.zeros((M_, NN), jnp.int32))
        return kern

    def make_mm(K):
        def run(x, w):
            return pl.pallas_call(
                mm_loop_kernel(K),
                out_shape=jax.ShapeDtypeStruct((M_, NN), jnp.int32),
                interpret=not on_tpu,
            )(x, w)
        return jax.jit(run)

    per_mm = slope("int8 (1024,48)@(48,96) in-kernel", make_mm, 8, 64,
                   M_ * K_ * NN, x8, w8)
    print(f"  == {M_*K_*NN/per_mm/1e9:.1f} G MACs/s at reduction shape",
          flush=True)

    # --- 4. sorted MSM c sweep at 2^17 ----------------------------------------
    scal = rng.integers(0, 1 << 16, (N, 16), dtype=np.uint16)
    limbs = jax.device_put(jnp.asarray(scal))
    for c in (8, 10, 12, 13):
        fn = jax.jit(lambda pk, s, c=c: MS.sorted_msm_from_limbs(
            W.G1Ops, pk, s, c, signed=False))
        timeit(f"sorted MSM 2^17 c={c}", fn, rows_dev, limbs, iters=3)

    print("done", flush=True)


if __name__ == "__main__":
    sys.exit(main())

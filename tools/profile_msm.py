#!/usr/bin/env python
"""Phase-by-phase timing of the 2^17 G1 Pippenger MSM on the real TPU.

Splits ops/msm.py pippenger_msm into its four phases and times each as a
separate jitted program (after warmup), so round-2 optimization targets the
real bottleneck instead of the assumed one.
"""

import os
import sys
import time

import numpy as np

N = int(os.environ.get("MSM_N", 1 << 17))
C = int(os.environ.get("MSM_C", 8))
LANES = int(os.environ.get("MSM_LANES", 64))


def main():
    import jax
    import jax.numpy as jnp

    from masp_tpu.ops import field_jax as F

    on_tpu = jax.default_backend() == "tpu"
    F.set_impl("pallas" if on_tpu else "compact")
    print(f"backend={jax.default_backend()} impl={F.get_impl()} N={N} c={C} lanes={LANES}",
          flush=True)

    from masp_tpu.curves.bls12_381 import G1
    from masp_tpu.ops import msm as M
    from masp_tpu.ops import weierstrass_jax as W

    rng = np.random.default_rng(7)
    base_pts = [G1.generator() * int(k) for k in rng.integers(1, 1 << 62, 16)]
    pts = base_pts * (N // 16)
    scalars = [int.from_bytes(rng.bytes(32), "little") % (1 << 255) for _ in range(N)]
    px, py, pz = (jnp.asarray(x) for x in W.encode_g1_points(pts))
    digits = jnp.asarray(M.scalars_to_digits(scalars, C, 256))
    W_n = digits.shape[1]
    B = 1 << C
    fops = W.G1Ops

    # --- phase functions (mirror ops/msm.py pippenger_msm) ---
    def main_loop(px, py, pz, digits):
        state = M._traced_identity(fops, px, (LANES, W_n, B))
        lane_idx = jnp.arange(LANES)[:, None]
        win_idx = jnp.arange(W_n)[None, :]
        steps = N // LANES
        d_steps = digits.reshape(steps, LANES, W_n)

        def body(s, state):
            SX, SY, SZ = state
            d = d_steps[s]
            start = s * LANES
            p = tuple(jax.lax.dynamic_slice_in_dim(a, start, LANES, 0) for a in (px, py, pz))
            b = tuple(jnp.broadcast_to(a[:, None], (LANES, W_n) + fops.coord_shape) for a in p)
            cur = (SX[lane_idx, win_idx, d], SY[lane_idx, win_idx, d], SZ[lane_idx, win_idx, d])
            new = W.g_add(fops, cur, b)
            SX = SX.at[lane_idx, win_idx, d].set(new[0])
            SY = SY.at[lane_idx, win_idx, d].set(new[1])
            SZ = SZ.at[lane_idx, win_idx, d].set(new[2])
            return (SX, SY, SZ)

        return jax.lax.fori_loop(0, steps, body, state)

    def lane_combine(SX, SY, SZ):
        acc0 = M._traced_identity(fops, SX, (W_n, B))

        def lane_body(p, acc):
            return W.g_add(fops, acc, (SX[p], SY[p], SZ[p]))

        return jax.lax.fori_loop(0, LANES, lane_body, acc0)

    def bucket_phase(bx, by, bz):
        ident_w = M._traced_identity(fops, bx, (W_n,))

        def bucket_body(j, carry):
            running, acc = carry
            k = B - 1 - j
            running = W.g_add(fops, running, (bx[:, k], by[:, k], bz[:, k]))
            acc = W.g_add(fops, acc, running)
            return (running, acc)

        _, window_sums = jax.lax.fori_loop(0, B - 1, bucket_body, (ident_w, ident_w))
        return window_sums

    def window_phase(wx, wy, wz):
        window_sums = (wx, wy, wz)
        ident_1 = M._traced_identity(fops, wx, (1,))

        def window_body(j, acc):
            w = W_n - 1 - j
            acc = W.g_add(fops, acc,
                          tuple(jax.lax.dynamic_slice_in_dim(s, w, 1, 0) for s in window_sums))

            def dbl(_i, a):
                return W.g_add(fops, a, a)

            doubled = jax.lax.fori_loop(0, C, dbl, acc)
            return W.point_select(jnp.asarray([j < W_n - 1]), doubled, acc)

        return jax.lax.fori_loop(0, W_n, window_body, ident_1)

    jmain = jax.jit(main_loop)
    jlane = jax.jit(lane_combine)
    jbucket = jax.jit(bucket_phase)
    jwin = jax.jit(window_phase)
    jfull = jax.jit(lambda px, py, pz, d: M.pippenger_msm(fops, (px, py, pz), d, c=C, lanes=LANES))

    def fetch(out):
        # axon: block_until_ready can return early; a host fetch is the only
        # reliable completion barrier
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])

    def timeit(name, fn, *args, iters=3):
        t0 = time.time()
        out = fn(*args)
        fetch(out)
        t_first = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        dt = (time.time() - t0) / iters
        print(f"{name:14s} warm {dt*1e3:9.1f} ms   (first {t_first:.1f} s)",
              flush=True)
        return out

    state = timeit("main_loop", jmain, px, py, pz, digits)
    buckets = timeit("lane_combine", jlane, *state)
    wins = timeit("bucket_phase", jbucket, *buckets)
    res = timeit("window_phase", jwin, *wins)
    timeit("FULL msm", jfull, px, py, pz, digits, iters=2)

    # correctness spot check vs host
    want = G1.identity()
    for p, s in zip(base_pts, range(1)):
        pass
    acc = None
    # host reference via sum of s_i P_i using pow-of-16 structure is too slow;
    # compare full-vs-phases instead
    full = jfull(px, py, pz, digits)
    got_phase = W.decode_g1_points(*(np.asarray(x)[None] for x in res))[0]
    got_full = W.decode_g1_points(*(np.asarray(x)[None] for x in full))[0]
    assert got_phase == got_full, "phase pipeline != full MSM"
    print("phase pipeline == full MSM: OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""TPU benchmark: sorted-prefix MSM vs round-1 pippenger at prove shapes."""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from masp_tpu.curves.bls12_381 import G1, G2
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops import msm as M
    from masp_tpu.ops import msm_sorted as MS
    from masp_tpu.ops import weierstrass_jax as W

    on_tpu = jax.default_backend() == "tpu"
    F.set_impl("pallas" if on_tpu else "compact")
    print("backend:", jax.default_backend(), flush=True)

    logn = int(os.environ.get("MSM_LOGN", "17"))
    N = 1 << logn
    rng = np.random.default_rng(3)

    # one random point tiled (add/gather cost identical; encoding is fast)
    p = G1.generator() * 123456789
    coords1 = [np.tile(np.asarray(c), (N, 1)) for c in W.encode_g1_points([p])]
    packed1 = jnp.asarray(np.concatenate(coords1, axis=1))
    digits = jnp.asarray(rng.integers(0, 256, (N, 32), dtype=np.int32))

    def timeit(name, fn, *args, iters=3):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t_first = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        dt = (time.time() - t0) / iters
        print(f"{name:34s} {dt*1e3:9.1f} ms  (first {t_first:.1f} s)", flush=True)
        return dt

    sorted_g1 = jax.jit(lambda pk, d: MS.sorted_msm(W.G1Ops, pk, d, 8))
    t_s = timeit(f"sorted_msm G1 2^{logn}", sorted_g1, packed1, digits)

    if os.environ.get("MSM_BENCH_G2", "1") == "1":
        logn2 = int(os.environ.get("MSM_LOGN2", "14"))
        N2 = 1 << logn2
        q = G2.generator() * 987654321
        coords2 = [
            np.tile(np.asarray(c), (N2, 1, 1)) for c in W.encode_g2_points([q])
        ]
        packed2 = jnp.asarray(
            np.concatenate([c.reshape(N2, -1) for c in coords2], axis=1)
        )
        digits2 = jnp.asarray(rng.integers(0, 256, (N2, 32), dtype=np.int32))
        sorted_g2 = jax.jit(lambda pk, d: MS.sorted_msm(W.G2Ops, pk, d, 8))
        timeit(f"sorted_msm G2 2^{logn2}", sorted_g2, packed2, digits2)

    if os.environ.get("MSM_SWEEP_C"):
        # signed-digit window-width sweep (round-3): digits extracted
        # in-graph from 16-bit limb rows, balanced representation
        limbs_np = rng.integers(0, 1 << 16, (N, 16), dtype=np.uint32)
        limbs_np[:, 15] &= 0x7FFF  # < 2^255, the scalar-field envelope
        limbs = jnp.asarray(limbs_np)
        for c in (int(x) for x in os.environ["MSM_SWEEP_C"].split(",")):
            fn = jax.jit(
                lambda pk, l, c=c: MS.sorted_msm_from_limbs(
                    W.G1Ops, pk, l, c, signed=True
                )
            )
            t = timeit(f"signed sorted_msm G1 2^{logn} c={c}", fn, packed1, limbs)
            w = MS.n_windows_for(c, True)
            print(f"  -> {N*w/t/1e6:.1f} M tree-adds/s, W={w}", flush=True)

    if os.environ.get("MSM_BENCH_PIP", "0") == "1":
        pip_g1 = jax.jit(
            lambda x, y, z, d: M.pippenger_msm(W.G1Ops, (x, y, z), d, c=8, lanes=64)
        )
        cs = [jnp.asarray(c) for c in coords1]
        timeit(f"pippenger G1 2^{logn}", pip_g1, *cs, digits)

    rate = N * 32 / t_s / 1e6
    print(f"effective adds rate ~{rate:.1f} M/s (N*W/t)", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Probe: cost drivers for the batch-affine MSM ladder design.

Measures on the real chip:
  1. baseline sorted_msm 2^17 c=8 (reference point),
  2. a chain of 17 width-1 Fermat inversions inside ONE jitted program
     (the per-level root-inverse cost of an exact-inverse affine ladder),
  3. bulk mont_mul throughput at ladder-like widths (the MAC floor).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from masp_tpu.curves.bls12_381 import G1
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops import msm_sorted as MS
    from masp_tpu.ops import weierstrass_jax as W
    from masp_tpu.ops.field_jax import FQ

    on_tpu = jax.default_backend() == "tpu"
    F.set_impl("pallas" if on_tpu else "compact")
    print("backend:", jax.default_backend(), flush=True)

    def timeit(name, fn, *args, iters=5):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t_first = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.time()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            ts.append(time.time() - t0)
        dt = float(np.median(ts))
        print(f"{name:44s} {dt*1e3:9.2f} ms  (first {t_first:.1f} s, "
              f"min {min(ts)*1e3:.2f})", flush=True)
        return dt

    rng = np.random.default_rng(3)

    # --- 3. bulk mont_mul throughput -----------------------------------
    for n in (1 << 16, 1 << 18):
        a = jnp.asarray(rng.integers(0, 1 << 16, (n, 24), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, (n, 24), dtype=np.uint32))
        f = jax.jit(lambda x, y: F.mont_mul(FQ, x, y))
        t = timeit(f"mont_mul Fq width 2^{n.bit_length()-1}", f, a, b)
        print(f"   -> {n/t/1e6:.1f} M muls/s", flush=True)

    # --- 2. chained width-1 Fermat inversions --------------------------
    a1 = jnp.asarray(rng.integers(0, 1 << 16, (1, 24), dtype=np.uint32))

    def chain17(x):
        def body(c, _):
            c = F.mont_inv(FQ, c)
            return c, None
        out, _ = jax.lax.scan(body, x, None, length=17)
        return out

    f17 = jax.jit(chain17)
    t17 = timeit("17x chained Fermat inv (width 1)", f17, a1)
    print(f"   -> {t17/17*1e3:.2f} ms per inversion", flush=True)

    # same at width 32 (window-batched root)
    a32 = jnp.asarray(rng.integers(0, 1 << 16, (32, 24), dtype=np.uint32))
    f17w = jax.jit(chain17)
    timeit("17x chained Fermat inv (width 32)", f17w, a32)

    # --- 1. baseline sorted MSM ----------------------------------------
    if os.environ.get("PROBE_MSM", "1") == "1":
        N = 1 << 17
        p = G1.generator() * 123456789
        coords1 = [np.tile(np.asarray(c), (N, 1))
                   for c in W.encode_g1_points([p])]
        packed1 = jnp.asarray(np.concatenate(coords1, axis=1))
        digits = jnp.asarray(rng.integers(0, 256, (N, 32), dtype=np.int32))
        sorted_g1 = jax.jit(lambda pk, d: MS.sorted_msm(W.G1Ops, pk, d, 8))
        t = timeit("sorted_msm G1 2^17 c=8 (baseline)", sorted_g1,
                   packed1, digits, iters=4)
        print(f"   -> {N*32/t/1e6:.1f} M tree-adds/s", flush=True)


if __name__ == "__main__":
    main()

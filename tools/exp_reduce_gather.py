#!/usr/bin/env python
"""(a) wide vs fori bucket reduce at (32,256); (b) klay axis-1 gather cost."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp, numpy as np
    from masp_tpu.curves.bls12_381 import G1
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops import msm_sorted as MS
    from masp_tpu.ops import weierstrass_jax as W

    F.set_impl("pallas" if jax.default_backend() == "tpu" else "compact")
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(3)

    def timeit(name, fn, *args, iters=4):
        def sync(out):
            for leaf in jax.tree_util.tree_leaves(out):
                np.asarray(leaf.reshape(-1)[:1])
        t0 = time.time(); sync(fn(*args)); tf = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.time(); sync(fn(*args)); ts.append(time.time() - t0)
        print(f"{name:44s} {np.median(ts)*1e3:9.1f} ms (first {tf:.0f} s)", flush=True)
        return float(np.median(ts))

    # fake bucket sums (32, 256, 24)-shaped coords
    bx = jnp.asarray(rng.integers(0, 1 << 16, (32, 256, 24), dtype=np.uint32))
    by = jnp.asarray(rng.integers(0, 1 << 16, (32, 256, 24), dtype=np.uint32))
    bz = jnp.asarray(rng.integers(0, 1 << 16, (32, 256, 24), dtype=np.uint32))
    like = bx[0, 0][None]

    def red(wide):
        def f(x, y, z):
            old = MS.WIDE_REDUCE
            MS.WIDE_REDUCE = wide
            try:
                return MS.bucket_reduce_horner(W.G1Ops, (x, y, z), 8, like)
            finally:
                MS.WIDE_REDUCE = old
        return jax.jit(f)
    timeit("bucket reduce fori (prod)", red(False), bx, by, bz)
    timeit("bucket reduce wide", red(True), bx, by, bz)

    # klay axis-1 gather: (24, W*N) -> (24, 8192)
    nod = jnp.asarray(rng.integers(0, 1 << 16, (24, 1 << 21), dtype=np.uint32))
    gi = jnp.asarray(rng.integers(0, 1 << 21, (8192,), dtype=np.int32))
    timeit("klay axis-1 gather 8192 of 2^21",
           jax.jit(lambda n_, g: jnp.take(n_, g, axis=1)), nod, gi)
    # vs batch-major gather 8192 rows of (2^21, 24)
    nod2 = jnp.asarray(rng.integers(0, 1 << 16, (1 << 21, 24), dtype=np.uint32))
    timeit("batch-major gather 8192 rows of 2^21",
           jax.jit(lambda n_, g: jnp.take(n_, g, axis=0)), nod2, gi)
    # from_kernel_layout dump of one level-1 array (24, 2^20) for scale
    k1 = jnp.asarray(rng.integers(0, 1 << 16, (24, 1 << 20 // 128 * 128 // 128, 128), dtype=np.uint32))
    from masp_tpu.kernels import field_kernels as FK
    k1 = jnp.asarray(rng.integers(0, 1 << 16, (24, (1 << 20) // 128, 128), dtype=np.uint32))
    timeit("from_kernel_layout 2^20x24 (one dump)",
           jax.jit(lambda a: FK.from_kernel_layout(a, 1 << 20, (24,))), k1)

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Chip bench round 2: klay-gather queries + wide reduce, K sweep."""
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
    N = 1 << 17
    rng = np.random.default_rng(3)
    p = G1.generator() * 123456789
    coords1 = [np.tile(np.asarray(c), (N, 1)) for c in W.encode_g1_points([p])]
    packed1 = jnp.asarray(np.concatenate(coords1, axis=1))
    digits = jnp.asarray(rng.integers(0, 256, (N, 32), dtype=np.int32))

    def timeit(name, fn, *args, iters=4):
        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.reshape(-1)[:1])
        t0 = time.time(); sync(fn(*args)); tf = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.time(); sync(fn(*args)); ts.append(time.time() - t0)
        print(f"{name:42s} {np.median(ts)*1e3:9.1f} ms (first {tf:.0f} s, "
              f"min {min(ts)*1e3:.1f})", flush=True)
        return float(np.median(ts))

    MS.AFFINE_LADDER = True
    for K in (int(x) for x in os.environ.get("SWEEP_K", "5,4,6").split(",")):
        def msm(pk, d, K=K):
            b = MS.window_buckets_flat(W.G1Ops, pk, d, 8, affine_levels=K)
            like = MS._unpack(W.G1Ops, pk)[0]
            return MS.bucket_reduce_horner(W.G1Ops, b, 8, like, wide=True)
        timeit(f"flatv2 sorted_msm K={K} 2^17 c=8", jax.jit(msm),
               packed1, digits)

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Chip bench: batch-affine flattened ladder vs round-4 scan path, 2^17 G1."""
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
    N = 1 << int(os.environ.get("MSM_LOGN", "17"))
    rng = np.random.default_rng(3)
    p = G1.generator() * 123456789
    coords1 = [np.tile(np.asarray(c), (N, 1)) for c in W.encode_g1_points([p])]
    packed1 = jnp.asarray(np.concatenate(coords1, axis=1))
    digits = jnp.asarray(rng.integers(0, 256, (N, 32), dtype=np.int32))

    def timeit(name, fn, *args, iters=4):
        t0 = time.time(); out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t_first = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.time(); out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            ts.append(time.time() - t0)
        dt = float(np.median(ts))
        print(f"{name:40s} {dt*1e3:9.1f} ms (first {t_first:.0f} s, min {min(ts)*1e3:.1f})", flush=True)
        return dt

    for K in (int(x) for x in os.environ.get("SWEEP_K", "6,4,8").split(",")):
        MS.AFFINE_LADDER = True
        MS.AFFINE_LEVELS = K
        fn = jax.jit(lambda pk, d, K=K: MS.window_buckets_flat(
            W.G1Ops, pk, d, 8, affine_levels=K))
        # buckets only (the ladder+query phases; reduction shared/unchanged)
        timeit(f"flat buckets K={K} 2^17 c=8", fn, packed1, digits)
    MS.AFFINE_LADDER = False
    fn0 = jax.jit(lambda pk, d: MS.window_buckets(W.G1Ops, pk, d, 8))
    timeit("scan buckets (round-4 path)", fn0, packed1, digits)

if __name__ == "__main__":
    main()

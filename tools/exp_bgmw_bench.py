#!/usr/bin/env python
"""Chip bench: BGMW fixed-base merged MSM vs sorted Pippenger, h-query shape.

VERDICT round-4 item 2: the BGMW path (prover.py MASP_MSM_BGMW_H) was built
and correctness-tested but never timed. This measures it at production
shape (2^17 G1) for c in BGMW_SWEEP_C, plus the one-time table build.
"""
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
    N = 1 << int(os.environ.get("MSM_LOGN", "17"))

    p = G1.generator() * 123456789
    coords1 = [np.tile(np.asarray(c), (N, 1)) for c in W.encode_g1_points([p])]
    packed1 = jnp.asarray(np.concatenate(coords1, axis=1))
    limbs_np = rng.integers(0, 1 << 16, (N, 16), dtype=np.uint32)
    limbs_np[:, 15] &= 0x7FFF
    limbs = jnp.asarray(limbs_np)

    def timeit(name, fn, *args, iters=4):
        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.reshape(-1)[:1])
        t0 = time.time(); out = fn(*args); sync(out); tf = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.time(); sync(fn(*args)); ts.append(time.time() - t0)
        print(f"{name:42s} {np.median(ts)*1e3:9.1f} ms (first {tf:.0f} s, "
              f"min {min(ts)*1e3:.1f})", flush=True)
        return float(np.median(ts))

    # baseline: unsigned c=8 from-limbs (the production default)
    base = jax.jit(lambda pk, l: MS.sorted_msm_from_limbs(
        W.G1Ops, pk, l, 8, signed=False))
    timeit("sorted_msm c=8 unsigned (prod default)", base, packed1, limbs)

    for c in (int(x) for x in os.environ.get("BGMW_SWEEP_C", "12,10,14").split(",")):
        build = jax.jit(lambda pk, c=c: MS.build_bgmw_table(W.G1Ops, pk, c))
        t0 = time.time()
        table = build(packed1)
        jax.tree_util.tree_leaves(table)[0].block_until_ready()
        np.asarray(table.reshape(-1)[:1])
        print(f"bgmw table build c={c}: {time.time()-t0:.1f} s "
              f"({table.shape[0]*table.shape[1]*4/1e9:.2f} GB)", flush=True)
        fn = jax.jit(lambda t, l, c=c: MS.bgmw_msm_from_limbs(W.G1Ops, t, l, c))
        timeit(f"bgmw_msm c={c} 2^17", fn, table, limbs)
        del table

if __name__ == "__main__":
    main()

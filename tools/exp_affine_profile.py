#!/usr/bin/env python
"""XProf capture of one flat-affine sorted_msm iteration (K=4)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp, numpy as np
    from masp_tpu.curves.bls12_381 import G1
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops import msm_sorted as MS
    from masp_tpu.ops import weierstrass_jax as W

    F.set_impl("pallas")
    N = 1 << 17
    rng = np.random.default_rng(3)
    p = G1.generator() * 123456789
    coords1 = [np.tile(np.asarray(c), (N, 1)) for c in W.encode_g1_points([p])]
    packed1 = jnp.asarray(np.concatenate(coords1, axis=1))
    digits = jnp.asarray(rng.integers(0, 256, (N, 32), dtype=np.int32))
    MS.AFFINE_LADDER = True

    def msm(pk, d):
        b = MS.window_buckets_flat(W.G1Ops, pk, d, 8, affine_levels=4)
        like = MS._unpack(W.G1Ops, pk)[0]
        return MS.bucket_reduce_horner(W.G1Ops, b, 8, like)
    fn = jax.jit(msm)
    def sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.reshape(-1)[:1])
    sync(fn(packed1, digits))  # compile
    sync(fn(packed1, digits))
    outdir = "/tmp/xprof_affine"
    with jax.profiler.trace(outdir):
        sync(fn(packed1, digits))
        sync(fn(packed1, digits))
    print("trace written to", outdir, flush=True)

if __name__ == "__main__":
    main()

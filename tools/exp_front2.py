#!/usr/bin/env python
"""Cumulative differencing inside the flat front."""
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
            for leaf in jax.tree_util.tree_leaves(out):
                np.asarray(leaf.reshape(-1)[:1])
        t0 = time.time(); sync(fn(*args)); tf = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.time(); sync(fn(*args)); ts.append(time.time() - t0)
        print(f"{name:40s} {np.median(ts)*1e3:9.1f} ms (first {tf:.0f} s)", flush=True)
        return float(np.median(ts))

    rev = jnp.asarray(MS._bitrev_perm(17))

    def stage(upto):
        def f(pk, d):
            keys = d.T.astype(jnp.int32)
            iota = jnp.arange(N, dtype=jnp.int32)
            sk, perm = jax.vmap(lambda kk: jax.lax.sort_key_val(kk, iota))(keys)
            if upto == 1:
                return perm
            kvals = jnp.arange(256, dtype=jnp.int32)
            bounds = jax.vmap(
                lambda s: jnp.searchsorted(s, kvals, side="right"))(sk)
            perm = jnp.take(perm, rev, axis=1)
            if upto == 2:
                return perm, bounds
            pf = perm.reshape(-1)
            rows = jnp.take(pk[:, :48], pf, axis=0)
            if upto == 3:
                return rows, bounds
            inf = W.G1Ops.is_zero(pk[:, 48:].reshape(N, 24)).astype(jnp.int32)
            f_ = jnp.take(inf, pf)
            return rows, f_, bounds
        return jax.jit(f)

    timeit("S1 sort", stage(1), packed1, digits)
    timeit("S2 +bounds+rev", stage(2), packed1, digits)
    timeit("S3 +rowgather", stage(3), packed1, digits)
    timeit("S4 +flaggather", stage(4), packed1, digits)

    # packed-flag variant: one 52-col gather (48 coords + flag + pad to 4)
    def packed_variant(pk, d):
        keys = d.T.astype(jnp.int32)
        iota = jnp.arange(N, dtype=jnp.int32)
        sk, perm = jax.vmap(lambda kk: jax.lax.sort_key_val(kk, iota))(keys)
        kvals = jnp.arange(256, dtype=jnp.int32)
        bounds = jax.vmap(lambda s: jnp.searchsorted(s, kvals, side="right"))(sk)
        perm = jnp.take(perm, rev, axis=1)
        inf = W.G1Ops.is_zero(pk[:, 48:].reshape(N, 24)).astype(jnp.uint32)
        src = jnp.concatenate([pk[:, :48], inf[:, None]], axis=1)
        rows = jnp.take(src, perm.reshape(-1), axis=0)
        return rows, bounds
    timeit("S4' packed 49-col gather", jax.jit(packed_variant), packed1, digits)

if __name__ == "__main__":
    main()

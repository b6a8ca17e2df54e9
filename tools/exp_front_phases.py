#!/usr/bin/env python
"""Micro-differencing of the flat front: sort, bounds, perm-rev, row
gather, flag gather."""
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
    W_ = 32
    rng = np.random.default_rng(3)
    p = G1.generator() * 123456789
    coords1 = [np.tile(np.asarray(c), (N, 1)) for c in W.encode_g1_points([p])]
    packed1 = jnp.asarray(np.concatenate(coords1, axis=1))
    digits = jnp.asarray(rng.integers(0, 256, (N, 32), dtype=np.int32))
    perm_pre = jnp.asarray(
        np.stack([rng.permutation(N).astype(np.int32) for _ in range(W_)]))

    def timeit(name, fn, *args, iters=4):
        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.reshape(-1)[:1])
        t0 = time.time(); sync(fn(*args)); tf = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.time(); sync(fn(*args)); ts.append(time.time() - t0)
        print(f"{name:44s} {np.median(ts)*1e3:9.1f} ms (first {tf:.0f} s)", flush=True)
        return float(np.median(ts))

    def sort_only(d):
        keys = d.T.astype(jnp.int32)
        iota = jnp.arange(N, dtype=jnp.int32)
        sk, perm = jax.vmap(lambda kk: jax.lax.sort_key_val(kk, iota))(keys)
        return perm
    timeit("sort only", jax.jit(sort_only), digits)

    def sort_bounds(d):
        keys = d.T.astype(jnp.int32)
        iota = jnp.arange(N, dtype=jnp.int32)
        sk, perm = jax.vmap(lambda kk: jax.lax.sort_key_val(kk, iota))(keys)
        kvals = jnp.arange(256, dtype=jnp.int32)
        bounds = jax.vmap(lambda s: jnp.searchsorted(s, kvals, side="right"))(sk)
        return perm, bounds
    timeit("sort + bounds", jax.jit(sort_bounds), digits)

    rev = jnp.asarray(MS._bitrev_perm(17))
    timeit("perm-rev (take axis=1)",
           jax.jit(lambda pm: jnp.take(pm, rev, axis=1)), perm_pre)
    timeit("row gather 4.19M x 48col",
           jax.jit(lambda pk, pm: jnp.take(pk[:, :48], pm.reshape(-1), axis=0)),
           packed1, perm_pre)
    timeit("row gather 4.19M x 72col (scanpath-like)",
           jax.jit(lambda pk, pm: jnp.take(pk, pm.reshape(-1), axis=0)),
           packed1, perm_pre)
    inf = jnp.asarray(rng.integers(0, 2, N, dtype=np.int32))
    timeit("flag gather 4.19M x 1col",
           jax.jit(lambda f, pm: jnp.take(f, pm.reshape(-1))), inf, perm_pre)
    timeit("flag gather via 49-col pack",
           jax.jit(lambda pk, f, pm: jnp.take(
               jnp.concatenate([pk[:, :48], f[:, None].astype(jnp.uint32)], axis=1),
               pm.reshape(-1), axis=0)), packed1, inf, perm_pre)

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Differencing profile of window_buckets_flat phases at 2^17 c=8 G1."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp, numpy as np
    from masp_tpu.curves.bls12_381 import G1
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops import msm_sorted as MS
    from masp_tpu.ops import weierstrass_jax as W
    from masp_tpu.kernels import field_kernels as FK

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
        print(f"{name:44s} {np.median(ts)*1e3:9.1f} ms (first {tf:.0f} s)", flush=True)
        return float(np.median(ts))

    n_windows = 32
    levels = 17

    def front(pk, d):
        """sort + bounds + gather + sign: everything before the ladder."""
        keys = d.T.astype(jnp.int32)
        iota = jnp.arange(N, dtype=jnp.int32)
        sk, perm = jax.vmap(lambda kk: jax.lax.sort_key_val(kk, iota))(keys)
        kvals = jnp.arange(256, dtype=jnp.int32)
        bounds = jax.vmap(lambda s: jnp.searchsorted(s, kvals, side="right"))(sk)
        rev = jnp.asarray(MS._bitrev_perm(levels))
        perm = jnp.take(perm, rev, axis=1)
        xy = pk[:, :48]
        z = pk[:, 48:]
        inf = W.G1Ops.is_zero(z).astype(jnp.int32)
        pf = perm.reshape(-1)
        rows = jnp.take(xy, pf, axis=0)
        f = jnp.take(inf, pf)
        return rows, f, bounds

    timeit("front (sort+bounds+gather)", jax.jit(front), packed1, digits)

    def front_klay(pk, d):
        rows, f, bounds = front(pk, d)
        x = rows[:, :24]; y = rows[:, 24:]
        kx = FK.to_kernel_layout(x, FK.TB)[0]
        ky = FK.to_kernel_layout(y, FK.TB)[0]
        return kx, ky, f, bounds
    timeit("front + to_klay", jax.jit(front_klay), packed1, digits)

    def ladder_only(pk, d, K=6):
        rows, f, bounds = front(pk, d)
        x = rows[:, :24]; y = rows[:, 24:]
        kx = FK.to_kernel_layout(x, FK.TB)[0]
        ky = FK.to_kernel_layout(y, FK.TB)[0]
        kf = f.astype(jnp.uint32).reshape(-1, FK.LANE)
        for l in range(K):
            kxe, kxo = MS._fold_halves_klay(kx, n_windows)
            kye, kyo = MS._fold_halves_klay(ky, n_windows)
            kfe, kfo = MS._fold_halves_flag(kf, n_windows)
            kx, ky, kf = FK.klay_affine_level(kxe, kye, kfe, kxo, kyo, kfo)
        return kx, ky, kf, bounds
    timeit("front + klay ladder K=6 (no dumps)", jax.jit(ladder_only),
           packed1, digits)

    def buckets_K(pk, d, K):
        return MS.window_buckets_flat(W.G1Ops, pk, d, 8, affine_levels=K)
    timeit("flat buckets K=6 (full)",
           jax.jit(lambda pk, d: buckets_K(pk, d, 6)), packed1, digits)
    timeit("flat buckets K=0 (all projective)",
           jax.jit(lambda pk, d: buckets_K(pk, d, 0)), packed1, digits)
    MS.AFFINE_LADDER = False
    timeit("scan buckets (round-4)",
           jax.jit(lambda pk, d: MS.window_buckets(W.G1Ops, pk, d, 8)),
           packed1, digits)

if __name__ == "__main__":
    main()

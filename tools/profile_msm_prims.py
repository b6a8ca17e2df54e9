#!/usr/bin/env python
"""Microbenchmarks for the sorted prefix-scan MSM building blocks on TPU:
sort_key_val, packed row gather, strided even/odd slicing + pallas add."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from masp_tpu.ops import field_jax as F

    on_tpu = jax.default_backend() == "tpu"
    F.set_impl("pallas" if on_tpu else "compact")
    print("backend:", jax.default_backend(), flush=True)

    N = 1 << 17
    rng = np.random.default_rng(3)

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])

    def timeit(name, fn, *args, iters=5):
        t0 = time.time()
        out = fn(*args)
        fetch(out)
        t_first = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        dt = (time.time() - t0) / iters
        print(f"{name:28s} {dt*1e3:9.2f} ms  (first {t_first:.1f} s)", flush=True)
        return out

    keys = jnp.asarray(rng.integers(0, 256, N, dtype=np.int32))
    iota = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def sort1(k, i):
        return jax.lax.sort_key_val(k, i)

    timeit("sort_key_val 2^17", sort1, keys, iota)

    @jax.jit
    def sort22(k2, i):
        # all 22 windows in one program via vmap
        return jax.vmap(lambda kk: jax.lax.sort_key_val(kk, i))(k2)

    keys22 = jnp.asarray(rng.integers(0, 4096, (22, N), dtype=np.int32))
    timeit("sort_key_val 22x 2^17", sort22, keys22, iota)

    # packed gather: (N, 128) u32 rows
    packed = jnp.asarray(rng.integers(0, 1 << 31, (N, 128), dtype=np.uint32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    @jax.jit
    def gat(p, idx):
        return jnp.take(p, idx, axis=0)

    timeit("packed gather (N,128)", gat, packed, perm)

    # narrow gather for comparison: (N, 24)
    narrow = packed[:, :24]

    @jax.jit
    def gat24(p, idx):
        return jnp.take(p, idx, axis=0)

    timeit("narrow gather (N,24)", gat24, narrow, perm)

    # limb-major strided halving add: one level of the prefix tree
    from masp_tpu.ops import weierstrass_jax as W

    pts = jnp.asarray(rng.integers(0, 1 << 16, (N, 24), dtype=np.uint32))

    @jax.jit
    def level_add(x, y, z):
        e = tuple(c[0::2] for c in (x, y, z))
        o = tuple(c[1::2] for c in (x, y, z))
        return W.g_add(W.G1Ops, e, o)

    timeit("even/odd G1 add N/2=65536", level_add, pts, pts, pts)

    # full prefix-sum ladder cost: sum over levels of even/odd adds (~2N)
    def prefix_ladder(x, y, z):
        arrs = (x, y, z)
        outs = []
        while arrs[0].shape[0] > 1:
            e = tuple(c[0::2] for c in arrs)
            o = tuple(c[1::2] for c in arrs)
            arrs = W.g_add(W.G1Ops, e, o)
            outs.append(arrs[0][:1])
        return outs

    jladder = jax.jit(prefix_ladder)
    timeit("halving ladder (N..1)", jladder, pts, pts, pts, iters=3)

    # transpose packed -> limb-major
    @jax.jit
    def to_limb_major(p):
        return jnp.swapaxes(p, 0, 1)

    timeit("transpose (N,128)->(128,N)", to_limb_major, packed)


if __name__ == "__main__":
    main()

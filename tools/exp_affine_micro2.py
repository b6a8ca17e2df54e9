#!/usr/bin/env python
"""Micro 2: sync via scalar fetch; difference out the relay constant."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp, numpy as np
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops import msm_sorted as MS
    from masp_tpu.ops import weierstrass_jax as W
    from masp_tpu.ops.field_jax import FQ

    F.set_impl("pallas" if jax.default_backend() == "tpu" else "compact")
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(3)

    def timeit(name, fn, *args, iters=5):
        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.reshape(-1)[:1])  # scalar fetch -> full sync
        t0 = time.time(); sync(fn(*args)); tf = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.time(); sync(fn(*args)); ts.append(time.time() - t0)
        print(f"{name:46s} {np.median(ts)*1e3:9.1f} ms (first {tf:.0f} s)", flush=True)
        return float(np.median(ts))

    n = 1 << 21
    a = jnp.asarray(rng.integers(0, 1 << 16, (n, 24), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (n, 24), dtype=np.uint32))

    def chain(k):
        def f(x, y):
            for _ in range(k):
                x = F.mont_mul(FQ, x, y)
            return x
        return jax.jit(f)
    t1 = timeit("pallas mul chain x1 2^21", chain(1), a, b)
    t5 = timeit("pallas mul chain x5 2^21", chain(5), a, b)
    print(f"   -> marginal pallas mul: {(t5-t1)/4*1e3:.2f} ms", flush=True)

    def chain_u(k):
        def f(x, y):
            for _ in range(k):
                x = F._mont_mul_unrolled(FQ, x, y)
            return x
        return jax.jit(f)
    u1 = timeit("unrolled-XLA mul chain x1 2^21", chain_u(1), a, b)
    u5 = timeit("unrolled-XLA mul chain x5 2^21", chain_u(5), a, b)
    print(f"   -> marginal unrolled mul: {(u5-u1)/4*1e3:.2f} ms", flush=True)

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Micro: where does the flat affine ladder's time go? (block_until_ready,
no host fetch — the first version accidentally timed 100-200 MB axon
transfers)."""
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
        t0 = time.time(); out = fn(*args)
        jax.block_until_ready(out)
        tf = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            ts.append(time.time() - t0)
        print(f"{name:46s} {np.median(ts)*1e3:9.1f} ms (first {tf:.0f} s)", flush=True)
        return np.median(ts)

    n = 1 << 21
    a = jnp.asarray(rng.integers(0, 1 << 16, (n, 24), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (n, 24), dtype=np.uint32))

    from masp_tpu.kernels.field_kernels import to_kernel_layout, from_kernel_layout, _mont_mul_callable, TB
    # layout round-trip alone
    timeit("to+from kernel layout 2^21x24",
           jax.jit(lambda x: from_kernel_layout(to_kernel_layout(x, TB)[0], n, (24,))), a)
    # kernel-layout mul WITHOUT conversions
    ak, _ = to_kernel_layout(a, TB); bk, _ = to_kernel_layout(b, TB)
    ak = jax.device_put(ak); bk = jax.device_put(bk)
    jax.block_until_ready(ak); jax.block_until_ready(bk)
    timeit("kernel-layout mont_mul 2^21 (no convert)",
           _mont_mul_callable("Fq", TB), ak, bk)
    # full pallas_mont_mul (with conversions)
    timeit("pallas_mont_mul 2^21 (with convert)",
           jax.jit(lambda x, y: F.mont_mul(FQ, x, y)), a, b)
    # strided pair slice + interleave (tree plumbing)
    timeit("x[0::2],x[1::2] mul 2^21",
           jax.jit(lambda x: F.mont_mul(FQ, x[0::2], x[1::2])), a)
    # one affine level at 2^20 pairs
    x1 = jnp.asarray(rng.integers(0, 1 << 16, (1 << 20, 24), dtype=np.uint32))
    y1 = jnp.asarray(rng.integers(0, 1 << 16, (1 << 20, 24), dtype=np.uint32))
    f1 = jnp.zeros((1 << 20,), jnp.int32)
    timeit("affine_level 2^20 pairs",
           jax.jit(lambda *p: MS._affine_level(W.G1Ops, p[:3], p[3:])),
           x1, y1, f1, y1, x1, f1)
    timeit("tree_batch_inv 2^20",
           jax.jit(lambda x: MS._tree_batch_inv(W.G1Ops, x)), x1)
    # g_add (fused pallas point add) at 2^20 for calibration
    z1 = jnp.asarray(rng.integers(0, 1 << 16, (1 << 20, 24), dtype=np.uint32))
    timeit("fused g_add 2^20 (calibration)",
           jax.jit(lambda u, v, w_: W.g_add(W.G1Ops, (u, v, w_), (v, w_, u))),
           x1, y1, z1)

if __name__ == "__main__":
    main()

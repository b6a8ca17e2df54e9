#!/usr/bin/env python
"""Phase breakdown of the sorted-prefix MSM on the real chip (round 4).

Phases of ops/msm_sorted.py window_buckets, each timed as a slope over K
in-jit repetitions (the relay's ~25-80 ms dispatch constant cancels):

  extract   windows_from_limbs
  sort      per-window sort_key_val + searchsorted bounds
  gather    per-window row gather into sorted order
  tree      the dyadic halving ladder (N-1 adds/window)
  queries   the B*(levels+1) prefix-boundary adds/selects
  reduce    bucket_reduce_horner
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C = int(os.environ.get("MSM_C", "8"))
LOGN = int(os.environ.get("MSM_LOGN", "17"))


def _force(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _force(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        _force(fn(*args))
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def slope(name, make_fn, *args, k1=1, k2=3, iters=5):
    t1 = timeit(make_fn(k1), *args, iters=iters)
    t2 = timeit(make_fn(k2), *args, iters=iters)
    per = (t2 - t1) / (k2 - k1)
    print(f"{name:28s} {per*1e3:9.2f} ms/rep   (t{k1}={t1*1e3:.1f} t{k2}={t2*1e3:.1f})",
          flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    from masp_tpu.ops import field_jax as F

    on_tpu = jax.default_backend() == "tpu"
    F.set_impl("pallas" if on_tpu else "compact")
    print(f"backend={jax.default_backend()} N=2^{LOGN} c={C}", flush=True)

    from masp_tpu.curves.bls12_381 import G1
    from masp_tpu.ops import msm_sorted as MS
    from masp_tpu.ops import weierstrass_jax as W
    from masp_tpu.ops.msm import _traced_identity

    rng = np.random.default_rng(7)
    N = 1 << LOGN
    fops = W.G1Ops
    p = G1.generator() * 987654321
    rows = jnp.asarray(np.concatenate(
        [np.tile(np.asarray(c), (N, 1)) for c in W.encode_g1_points([p])], axis=1))
    rows = jax.device_put(rows)
    limbs = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 16, (N, 16), dtype=np.uint16)))

    B = 1 << C
    levels = LOGN

    def rep(K, body, init):
        """Run body K times with a CSE-breaking tweak, reduce to a scalar."""
        def run(*args):
            def it(i, acc):
                out = body(i, *args)
                return acc + out
            return jax.lax.fori_loop(0, K, it, init)
        return jax.jit(run)

    # --- extract ---------------------------------------------------------------
    def ex_body(i, limbs):
        d = MS.windows_from_limbs(limbs ^ i.astype(jnp.uint16), C)
        return d.astype(jnp.uint32).sum()

    slope("extract", lambda K: rep(K, ex_body, jnp.uint32(0)), limbs)

    # precomputed digits for later phases
    digits = jax.jit(lambda l: MS.windows_from_limbs(l, C))(limbs)
    digits = jax.device_put(np.asarray(digits))
    Wn = digits.shape[1]

    # --- sort + bounds -----------------------------------------------------------
    def sort_body(i, digits):
        keys = (digits ^ i).T.astype(jnp.int32)
        iota = jnp.arange(N, dtype=jnp.int32)
        sk, perm = jax.vmap(lambda k: jax.lax.sort_key_val(k, iota))(keys)
        kv = jnp.arange(B, dtype=jnp.int32)
        bounds = jax.vmap(lambda s: jnp.searchsorted(s, kv, side="right"))(sk)
        return perm.sum().astype(jnp.uint32) + bounds.sum().astype(jnp.uint32)

    slope("sort+bounds", lambda K: rep(K, sort_body, jnp.uint32(0)), digits)

    # fixed perm/bounds for later phases
    iota = jnp.arange(N, dtype=jnp.int32)
    keys = digits.T.astype(jnp.int32)
    sk, perm = jax.jit(jax.vmap(lambda k: jax.lax.sort_key_val(k, iota)))(keys)
    kv = jnp.arange(B, dtype=jnp.int32)
    bounds = jax.jit(jax.vmap(
        lambda s: jnp.searchsorted(s, kv, side="right")))(sk).astype(jnp.int32)
    perm = jax.device_put(np.asarray(perm))
    bounds = jax.device_put(np.asarray(bounds))

    # --- gather (all windows, scanned like window_buckets) ----------------------
    def gather_body(i, rows, perm):
        def win(_, pw):
            r = jnp.take(rows, pw, axis=0)
            return 0, (r[:, :1] ^ i).astype(jnp.uint32).sum()
        _, s = jax.lax.scan(win, 0, perm)
        return s.sum()

    slope("gather x%d windows" % Wn,
          lambda K: rep(K, gather_body, jnp.uint32(0)), rows, perm, k1=1, k2=2)

    # --- tree only ---------------------------------------------------------------
    def tree_body(i, rows, perm):
        def win(_, pw):
            r = jnp.take(rows, pw, axis=0)
            cur = MS._unpack(fops, r)
            for _l in range(levels):
                nh = cur[0].shape[0] // 2
                paired = [c.reshape((nh, 2) + c.shape[1:]) for c in cur]
                cur = W.g_add(fops, tuple(pc[:, 0] for pc in paired),
                              tuple(pc[:, 1] for pc in paired))
            return 0, cur[0][0, 0] ^ i.astype(jnp.uint32)
        _, s = jax.lax.scan(win, 0, perm)
        return s.sum()

    slope("gather+tree x%d" % Wn,
          lambda K: rep(K, tree_body, jnp.uint32(0)), rows, perm, k1=1, k2=2)

    # --- full window_buckets ------------------------------------------------------
    def wb_body(i, rows, digits):
        b = MS.window_buckets(fops, rows, digits ^ i, C)
        return b[0][0, 0, 0]

    slope("window_buckets", lambda K: rep(K, wb_body, jnp.uint32(0)),
          rows, digits, k1=1, k2=2)

    # --- reduce -------------------------------------------------------------------
    like = MS._unpack(fops, rows)[0]
    bx = jnp.asarray(rng.integers(0, 1 << 16, (Wn, B, 24), dtype=np.uint32))
    by = jnp.asarray(rng.integers(0, 1 << 16, (Wn, B, 24), dtype=np.uint32))
    bz = jnp.asarray(rng.integers(0, 1 << 16, (Wn, B, 24), dtype=np.uint32))

    def red_body(i, bx, by, bz):
        out = MS.bucket_reduce_horner(fops, (bx ^ i, by, bz), C, like)
        return out[0][0]

    slope("bucket_reduce_horner", lambda K: rep(K, red_body, jnp.uint32(0)),
          bx, by, bz, k1=1, k2=3)

    # --- full MSM -----------------------------------------------------------------
    def full_body(i, rows, limbs):
        out = MS.sorted_msm_from_limbs(fops, rows, limbs ^ i.astype(jnp.uint16),
                                       C, signed=False)
        return out[0][0]

    slope("FULL sorted_msm", lambda K: rep(K, full_body, jnp.uint32(0)),
          rows, limbs, k1=1, k2=2)
    print("done", flush=True)


if __name__ == "__main__":
    sys.exit(main())

"""Multi-scalar multiplication on TPU.

Two shapes of the problem (SURVEY.md §7 Phase 5):

* ``fixed_base_scalarmuls`` — N independent [s_i]G for ONE base G
  (parameter generation): windowed table gathers + a sequential
  window-accumulation loop. Per-scalar results.

* ``pippenger_msm`` — sum_i [s_i]P_i over variable bases (the proving
  hot path, ~80% of Groth16 time). Lane-parallel bucket accumulation:
  each of P lanes owns a private (windows x buckets) bucket array, points
  stream through lanes in a fori_loop (gather -> complete add -> scatter
  with unique indices), then lanes tree-combine, buckets reduce by the
  running-suffix trick, and windows combine by Horner doubling.

All control flow is static; bodies compile once. Digits are c-bit windows
of canonical (non-Montgomery) scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from masp_tpu.ops import weierstrass_jax as W



def _traced_identity(fops, like, batch_shape):
    """Identity points of shape batch_shape + coord_shape, built from a
    traced array so the (possibly huge) state is an in-graph broadcast
    rather than a multi-hundred-MB constant literal embedded in the HLO.

    Weierstrass projective identity is (0 : 1 : 0); a curve with a
    different identity (Edwards (0 : 1 : 1) — ops/jubjub_jax.JubjubOps)
    declares it via an ``IDENTITY_MONT`` coord-constant tuple."""
    import jax.numpy as _jnp
    import numpy as _np

    from masp_tpu.ops.field_jax import FQ as _FQ

    zero_el = _jnp.zeros_like(like[(0,) * (like.ndim - len(fops.coord_shape))])
    big_zero = _jnp.broadcast_to(zero_el, tuple(batch_shape) + fops.coord_shape)
    ident = getattr(fops, "IDENTITY_MONT", None)
    if ident is not None:
        return tuple(big_zero + _np.asarray(c, dtype=_np.uint32) for c in ident)
    if len(fops.coord_shape) == 1:  # Fq
        one_small = _np.asarray(_FQ.ONE_MONT, dtype=_np.uint32)
    else:  # Fq2: (ONE_MONT, 0)
        one_small = _np.stack(
            [_np.asarray(_FQ.ONE_MONT, dtype=_np.uint32),
             _np.zeros(_FQ.L, dtype=_np.uint32)]
        )
    big_one = big_zero + one_small
    return (big_zero, big_one, big_zero)


def scalars_to_digits(scalars: list[int], c: int, num_bits: int = 255) -> np.ndarray:
    """[N] ints -> (N, W) int32 window digits, W = ceil(num_bits / c)."""
    n_windows = -(-num_bits // c)
    if c == 8:  # fast path: digits are bytes
        nbytes = -(-num_bits // 8)
        buf = b"".join(int(s).to_bytes(nbytes, "little") for s in scalars)
        arr = np.frombuffer(buf, dtype=np.uint8).reshape(len(scalars), nbytes)
        return arr[:, :n_windows].astype(np.int32)
    out = np.zeros((len(scalars), n_windows), dtype=np.int32)
    mask = (1 << c) - 1
    for i, s in enumerate(scalars):
        for w in range(n_windows):
            out[i, w] = (s >> (c * w)) & mask
    return out


def fr_digits_device(x_mont):
    """Device path: Montgomery Fr limbs (N, 16) -> byte digits (N, 32)
    int32 (c = 8), avoiding a host roundtrip for NTT outputs."""
    import jax.numpy as _jnp

    from masp_tpu.ops import field_jax as F

    canon = F.from_mont(F.FR, x_mont)  # 16-bit limbs, canonical
    lo = (canon & 0xFF).astype(_jnp.int32)
    hi = (canon >> 8).astype(_jnp.int32)
    n = canon.shape[0]
    return _jnp.stack([lo, hi], axis=-1).reshape(n, 32)


# ---------------------------------------------------------------------------
# Fixed-base: per-scalar results


def fixed_base_table(base, c: int = 8, num_bits: int = 256):
    """Host: windowed table T[w][k] = [k * 2^(c*w)] base (affine host
    points). Returns the nested list; encode with the caller's codec."""
    n_windows = -(-num_bits // c)
    table = []
    g = base
    for _w in range(n_windows):
        row = [type(base).identity()]
        acc = type(base).identity()
        for _k in range(1, 1 << c):
            acc = acc + g
            row.append(acc)
        table.append(row)
        # g <<= c
        for _ in range(c):
            g = g.double()
    return table


def fixed_base_scalarmuls(fops, table_xyz, digits):
    """[s_i] G for each scalar; table_xyz: 3 coord arrays (W, B, ...);
    digits: (N, W) int32. Returns per-scalar projective points (N, ...)."""
    TX, TY, TZ = table_xyz
    n_windows = TX.shape[0]

    def body(w, acc):
        d = digits[:, w]  # (N,)
        pt = (TX[w, d], TY[w, d], TZ[w, d])
        return W.g_add(fops, acc, pt)

    N = digits.shape[0]
    acc0 = _traced_identity(fops, TX, (N,))
    return jax.lax.fori_loop(0, n_windows, body, acc0)


# ---------------------------------------------------------------------------
# Variable-base Pippenger


def pippenger_msm(fops, points_xyz, digits, c: int, lanes: int = 64):
    """sum_i [s_i] P_i.

    points_xyz: 3 coord arrays (N, ...); digits: (N, W) int32 from
    scalars_to_digits(c). N must be a multiple of `lanes` (pad with
    identity + zero digits). Returns one projective point (coords with no
    batch axis).
    """
    PX, PY, PZ = points_xyz
    N = PX.shape[0]
    n_windows = digits.shape[1]
    B = 1 << c
    assert N % lanes == 0, "pad N to a multiple of lanes"
    steps = N // lanes

    cshape = fops.coord_shape
    state = _traced_identity(fops, PX, (lanes, n_windows, B))

    lane_idx = jnp.arange(lanes)[:, None]  # (lanes, 1)
    win_idx = jnp.arange(n_windows)[None, :]  # (1, W)

    d_steps = digits.reshape(steps, lanes, n_windows)

    def body(s, state):
        SX, SY, SZ = state
        d = d_steps[s]  # (lanes, W)
        start = s * lanes
        px = jax.lax.dynamic_slice_in_dim(PX, start, lanes, 0)
        py = jax.lax.dynamic_slice_in_dim(PY, start, lanes, 0)
        pz = jax.lax.dynamic_slice_in_dim(PZ, start, lanes, 0)
        # broadcast each lane's point across its windows
        bx = jnp.broadcast_to(px[:, None], (lanes, n_windows) + cshape)
        by = jnp.broadcast_to(py[:, None], (lanes, n_windows) + cshape)
        bz = jnp.broadcast_to(pz[:, None], (lanes, n_windows) + cshape)
        cur = (SX[lane_idx, win_idx, d], SY[lane_idx, win_idx, d], SZ[lane_idx, win_idx, d])
        new = W.g_add(fops, cur, (bx, by, bz))
        SX = SX.at[lane_idx, win_idx, d].set(new[0])
        SY = SY.at[lane_idx, win_idx, d].set(new[1])
        SZ = SZ.at[lane_idx, win_idx, d].set(new[2])
        return (SX, SY, SZ)

    state = jax.lax.fori_loop(0, steps, body, state)

    # combine lanes sequentially: (lanes, W, B) -> (W, B); body compiles
    # once, total work lanes * W * B adds (~10% of the main loop)
    SX, SY, SZ = state
    acc0 = _traced_identity(fops, PX, (n_windows, B))

    def lane_body(p, acc):
        return W.g_add(fops, acc, (SX[p], SY[p], SZ[p]))

    state = jax.lax.fori_loop(0, lanes, lane_body, acc0)  # (W, B, ...)

    # weighted bucket reduction: window[w] = sum_k k * bucket[w, k]
    # running-suffix trick from the top bucket down to 1.
    bx, by, bz = state
    ident_w = _traced_identity(fops, PX, (n_windows,))

    def bucket_body(j, carry):
        running, acc = carry
        k = B - 1 - j  # k from B-1 down to 1
        bucket = (bx[:, k], by[:, k], bz[:, k])
        running = W.g_add(fops, running, bucket)
        acc = W.g_add(fops, acc, running)
        return (running, acc)

    _, window_sums = jax.lax.fori_loop(0, B - 1, bucket_body, (ident_w, ident_w))

    # Horner over windows: result = sum_w 2^(c*w) window[w]
    ident_1 = _traced_identity(fops, PX, (1,))

    def window_body(j, acc):
        w = n_windows - 1 - j
        acc = W.g_add(
            fops,
            acc,
            tuple(jax.lax.dynamic_slice_in_dim(s, w, 1, 0) for s in window_sums),
        )

        def dbl_body(_i, a):
            return W.g_add(fops, a, a)

        doubled = jax.lax.fori_loop(0, c, dbl_body, acc)
        # don't double after the last (lowest) window
        return W.point_select(jnp.asarray([j < n_windows - 1]), doubled, acc)

    acc = jax.lax.fori_loop(0, n_windows, window_body, ident_1)
    return tuple(s[0] for s in acc)


def pad_points_for_msm(fops, encode_fn, points, scalars, lanes: int, c: int, num_bits: int = 255):
    """Host helper: encode points+digits padded to a lane multiple."""
    n = len(points)
    pad = (-n) % lanes
    if pad:
        ident = type(points[0]).identity()
        points = list(points) + [ident] * pad
        scalars = list(scalars) + [0] * pad
    coords = encode_fn(points)
    digits = scalars_to_digits(scalars, c, num_bits)
    return coords, digits


__all__ = [
    "scalars_to_digits", "fixed_base_table", "fixed_base_scalarmuls",
    "pippenger_msm", "pad_points_for_msm",
]

"""Multi-chip sharding for the proving pipeline.

The reference's only in-node parallelism is rayon work-stealing + optional
CUDA offload (SURVEY.md §2.4/§5.8). The TPU-native equivalents:

* ``sharded_pippenger`` — one large MSM sharded over a mesh axis: each
  device bucket-accumulates its point shard locally (ICI-free), partial
  sums are all-gathered (one tiny point per device) and combined.
* ``dp_sharded`` helpers — the embarrassingly-parallel proof-batch axis
  (each proof's NTT/witness independent), matching batch proving
  (BASELINE.json config #5).

The driver's dry-run compiles these over a virtual CPU mesh
(xla_force_host_platform_device_count), using the compact field impl.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from masp_tpu.ops import field_jax as F
from masp_tpu.ops import msm as M
from masp_tpu.ops import weierstrass_jax as W
from masp_tpu.ops.field_jax import FR


def make_mesh(n_devices: int | None = None, axis: str = "msm") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (axis,))


def sharded_pippenger(mesh: Mesh, fops, points_xyz, digits, c: int, lanes: int,
                      axis: str = "msm"):
    """MSM with the point axis sharded over `axis`.

    points_xyz: (N, ...) coord arrays, N divisible by mesh size * lanes.
    Returns a single projective point (unreplicated host-fetchable)."""

    n_shards = mesh.shape[axis]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def local_msm(px, py, pz, d):
        out = M.pippenger_msm(fops, (px, py, pz), d, c=c, lanes=lanes)
        return tuple(o[None] for o in out)  # (1, ...) per shard

    partials = local_msm(*points_xyz, digits)  # (n_shards, ...)

    # combine the per-shard partial sums (n_shards tiny point adds)
    def body(i, acc):
        shard = tuple(jax.lax.dynamic_slice_in_dim(s, i, 1, 0) for s in partials)
        return W.g_add(fops, acc, shard)

    acc0 = M._traced_identity(fops, partials[0], (1,))
    acc = jax.lax.fori_loop(0, n_shards, body, acc0)
    return tuple(s[0] for s in acc)


def sharded_ntt(mesh: Mesh, dom, x, axis: str = "ntt", inverse: bool = False):
    """Size-m NTT with the element axis sharded over `axis` (D devices).

    Distributed DIT radix-2: after the bit-reversal permutation the array
    is sharded in contiguous chunks of C = m/D elements. Stages with
    half = 2^s < C pair elements inside one chunk (ICI-free); the final
    log2(D) stages pair chunk d with chunk d XOR (half/C) — one
    ``ppermute`` chunk exchange per stage, each device computing its own
    half of the butterfly. Total multiplies identical to Domain.fft
    (groth16/domain.py); communication = log2(D) chunk swaps on ICI.

    Replaces bellperson's in-node rayon FFT (SURVEY.md L5) at pod scale.
    x: (m, L) Montgomery limbs. Returns the transformed (m, L) array.
    """
    D = mesh.shape[axis]
    m, log_m = dom.m, dom.log_m
    C = m // D
    assert C * D == m and C & (C - 1) == 0, "m must be D * power-of-two"
    log_c = C.bit_length() - 1

    tws = [jnp.asarray(t) for t in dom._twiddles(inverse)]
    brev = jnp.asarray(dom._bitrev())

    @partial(
        shard_map, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
        check_vma=False,
    )
    def body(xc):
        # xc: (C, L) local chunk (shard_map strips the sharded axis factor)
        d = jax.lax.axis_index(axis)

        # local stages: butterfly groups fit inside the chunk
        for s in range(min(log_c, log_m)):
            half = 1 << s
            xr = xc.reshape(C // (2 * half), 2, half, FR.L)
            even, odd = xr[:, 0], F.mont_mul(FR, xr[:, 1], tws[s][None])
            xc = jnp.stack(
                [F.add(FR, even, odd), F.sub(FR, even, odd)], axis=1
            ).reshape(C, FR.L)

        # cross-device stages: one chunk exchange per stage
        for s in range(log_c, log_m):
            half = 1 << s
            bit = half // C  # partner distance in chunks
            pairs = [(i, i ^ bit) for i in range(D)]
            yc = jax.lax.ppermute(xc, axis, pairs)
            is_even = (d & bit) == 0
            # twiddle run for this chunk: j = (d*C mod half) + [0..C)
            j0 = (jnp.remainder(d * C, half)).astype(jnp.int32)
            tw = jax.lax.dynamic_slice_in_dim(tws[s], j0, C, 0)
            E = jnp.where(is_even, xc, yc)
            O = jnp.where(is_even, yc, xc)
            wO = F.mont_mul(FR, O, tw)
            xc = jnp.where(
                is_even, F.add(FR, E, wO), F.sub(FR, E, wO)
            )
        return xc

    y = body(x[brev])
    if inverse:
        minv = jnp.asarray(F.encode(FR, [dom.m_inv])[0])
        y = F.mont_mul(FR, y, minv[None, :])
    return y


def sharded_sorted_msm(mesh: Mesh, fops, points_packed, digits, c: int,
                       axis: str = "msm", from_limbs: bool = False,
                       signed: bool = False):
    """Sorted-prefix MSM (ops/msm_sorted.py) with the point axis sharded.

    Each device computes bucket sums over its own point shard (ICI-free:
    local sort + prefix ladder), then the (W, B) bucket states are
    all-reduced across the axis with a log2(D)-stage ppermute butterfly of
    group adds; the bucket-weighted Horner reduction runs replicated.
    Communication: log2(D) * W * B point rows on ICI.

    points_packed: (N, rowlen) packed rows, N divisible by the axis size;
    digits: (N, W) window digits — or, with ``from_limbs``, (N, 16)
    canonical 16-bit limb rows extracted in-graph per shard (digit
    extraction is per-row, so it needs no communication). ``signed``
    selects balanced digits (B = 2^(c-1)+1). Returns one projective
    point, replicated.
    """
    from masp_tpu.ops import msm_sorted as MS

    D = mesh.shape[axis]
    stages = D.bit_length() - 1
    assert 1 << stages == D, "axis size must be a power of two"

    @partial(
        shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(), check_vma=False,
    )
    def body(pk, dg):
        if from_limbs:
            dg = MS.windows_from_limbs(dg, c, signed=signed)
        buckets = MS.window_buckets(fops, pk, dg, c, signed=signed)  # (W, B, ...) local
        n_windows, B = buckets[0].shape[0], buckets[0].shape[1]

        def flat(t):
            return tuple(x.reshape((n_windows * B,) + x.shape[2:]) for x in t)

        def unflat(t):
            return tuple(
                x.reshape((n_windows, B) + x.shape[1:]) for x in t
            )

        for s in range(stages):
            bit = 1 << s
            pairs = [(i, i ^ bit) for i in range(D)]
            other = tuple(jax.lax.ppermute(x, axis, pairs) for x in buckets)
            buckets = unflat(W.g_add(fops, flat(buckets), flat(other)))

        like = MS._unpack(fops, pk)[0]
        point = MS.bucket_reduce_horner(fops, buckets, c, like)
        return point

    return body(points_packed, digits)


def sharded_h_pipeline(mesh: Mesh, dom, az, bz, cz, axis: str = "ntt"):
    """The Groth16 h(x) quotient pipeline with every NTT element-sharded
    over `axis` (production m = 2^17): ifft -> coset scale -> fft per
    input, pointwise a*b - c, divide by Z, inverse coset transform.

    Elementwise scalings run under pjit between the shard_map transforms,
    so XLA keeps them on the same shards (no resharding); the only ICI
    traffic is the log2(D) butterfly chunk swaps inside each sharded_ntt.

    az/bz/cz: (m, L) CANONICAL limb arrays. Returns (m, L) Montgomery
    h coefficients (same contract as groth16.prover._compute_h_coeffs)."""
    gp = jnp.asarray(dom._powers(dom.g))
    gip = jnp.asarray(dom._powers(dom.g_inv))
    zinv = jnp.asarray(F.encode(FR, [dom.z_on_coset_inv])[0])

    def coset_eval(x):
        x = x.astype(jnp.uint32)
        x = F.to_mont(FR, x)
        x = sharded_ntt(mesh, dom, x, axis=axis, inverse=True)  # == ifft
        x = F.mont_mul(FR, x, gp)
        return sharded_ntt(mesh, dom, x, axis=axis, inverse=False)

    a = coset_eval(az)
    b = coset_eval(bz)
    c = coset_eval(cz)
    t = F.sub(FR, F.mont_mul(FR, a, b), c)
    t = F.mont_mul(FR, t, zinv[None, :])
    h = sharded_ntt(mesh, dom, t, axis=axis, inverse=True)
    return F.mont_mul(FR, h, gip)


def dp_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Batch-of-proofs axis sharding (DCN-friendly; no cross-talk)."""
    return NamedSharding(mesh, P(axis))


def dp_batch_ntt(mesh: Mesh, dom, values, axis: str = "dp"):
    """Batched NTT over a proof axis sharded across the mesh: values
    (B, m, L) with B sharded; each device transforms its proofs locally."""

    @partial(
        shard_map, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
        check_vma=False,
    )
    def local(v):
        return jax.vmap(dom.fft)(v)

    return local(values)


__all__ = [
    "make_mesh", "sharded_pippenger", "sharded_sorted_msm", "sharded_ntt",
    "sharded_h_pipeline", "dp_sharding", "dp_batch_ntt",
]

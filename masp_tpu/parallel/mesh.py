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
from jax.experimental.shard_map import shard_map

from masp_tpu.ops import msm as M
from masp_tpu.ops import weierstrass_jax as W


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
        check_rep=False,
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


def dp_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Batch-of-proofs axis sharding (DCN-friendly; no cross-talk)."""
    return NamedSharding(mesh, P(axis))


def dp_batch_ntt(mesh: Mesh, dom, values, axis: str = "dp"):
    """Batched NTT over a proof axis sharded across the mesh: values
    (B, m, L) with B sharded; each device transforms its proofs locally."""

    @partial(
        shard_map, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
        check_rep=False,
    )
    def local(v):
        return jax.vmap(dom.fft)(v)

    return local(values)


__all__ = ["make_mesh", "sharded_pippenger", "dp_sharding", "dp_batch_ntt"]

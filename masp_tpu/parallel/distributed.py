"""Multi-host (pod-scale) runtime: jax.distributed init + pod meshes.

The reference scales inside one node with rayon work-stealing thread
pools (masp_proofs/Cargo.toml rayon deps; SURVEY.md §2.4/§5.8) and has
no cross-node story. The TPU-native equivalent is JAX's multi-controller
runtime: every host in a pod slice runs the same program,
``jax.distributed.initialize`` wires the coordination service, and a
``Mesh`` over ``jax.devices()`` (all chips in the slice) lets pjit/
shard_map place collectives on ICI. This module owns that lifecycle:

* :func:`initialize` — idempotent multi-process init with env-based
  defaults. On real TPU pod slices JAX auto-detects everything from the
  TPU metadata; on CPU/GPU fleets the coordinator/process-count/
  process-id triplet comes from the environment.
* :func:`pod_mesh` — named-axis mesh over all global devices, laid out
  ICI-first via ``mesh_utils.create_device_mesh`` so the inner (most
  communication-heavy) axes ride ICI, not DCN.
* :func:`local_job_slice` / :func:`global_from_local` — the host-side
  work partitioning used by batch proving: each process synthesizes the
  witnesses for its own slice of a proof batch, then the per-host device
  arrays are stitched into one global sharded array.

Single-process use (one chip, tests, the virtual CPU mesh) never
requires calling anything here: ``initialize`` is a no-op when the
topology is single-process.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Start (or skip) the JAX multi-controller runtime. Idempotent.

    Resolution order for each field: explicit argument, then
    ``MASP_COORDINATOR`` / ``MASP_NUM_PROCESSES`` / ``MASP_PROCESS_ID``
    env vars, then JAX auto-detection (TPU pod metadata / cluster envs).
    Returns True when a multi-process runtime was started, False when
    running single-process (no coordinator configured and no cluster
    auto-detection available).
    """
    global _initialized
    if _initialized:
        return is_multiprocess()

    coordinator_address = coordinator_address or os.environ.get("MASP_COORDINATOR")
    if num_processes is None and "MASP_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MASP_NUM_PROCESSES"])
    if process_id is None and "MASP_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MASP_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # No explicit cluster config: stay single-process unless JAX can
        # auto-detect one (TPU pods). Auto-detection is only attempted
        # when requested, because jax.distributed.initialize() raises on
        # plain hosts.
        if os.environ.get("MASP_AUTO_DISTRIBUTED") == "1":
            jax.distributed.initialize()
            _initialized = True
            return is_multiprocess()
        _initialized = True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return is_multiprocess()


def pod_mesh(axes: dict[str, int] | None = None, *, devices=None) -> Mesh:
    """Mesh over all global devices with named axes, ICI-aware layout.

    ``axes`` maps axis name -> size, in outer-to-inner order; sizes must
    multiply to the global device count, with -1 once for "the rest"
    (like a reshape). Default: one ``{"msm": n}`` axis (the single-MSM
    sharding axis used by the mesh prover, parallel/mesh.py).

    ``mesh_utils.create_device_mesh`` orders devices so that the
    innermost axis maps to physically adjacent chips — keeping the
    bucket-butterfly ppermutes of ``sharded_sorted_msm`` and the NTT
    chunk swaps of ``sharded_ntt`` on ICI, and leaving the outer
    ``dp`` (proof-batch) axis to cross DCN where traffic is one proof
    point per step.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not axes:
        axes = {"msm": n}
    names = tuple(axes)
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if known <= 0 or n % known:
            raise ValueError(f"cannot infer -1 axis: {n} devices over {axes}")
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"axes {dict(zip(names, sizes))} != {n} devices")
    try:
        arr = mesh_utils.create_device_mesh(sizes, devices=devices)
    except (ValueError, AssertionError):
        # non-TPU topologies (CPU fleets, tests): plain row-major layout
        arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


@dataclass(frozen=True)
class JobSlice:
    """This process's contiguous slice of a global batch of B jobs."""

    start: int
    stop: int
    global_size: int

    def __len__(self) -> int:
        return self.stop - self.start

    def indices(self) -> range:
        return range(self.start, self.stop)


def local_job_slice(n_jobs: int, *, process_id: int | None = None,
                    process_count: int | None = None) -> JobSlice:
    """Partition B independent proof jobs across processes, contiguous
    blocks, remainder spread over the leading processes (host-side
    analogue of the dp axis; each process only synthesizes witnesses for
    its own block)."""
    pc = process_count if process_count is not None else jax.process_count()
    pid = process_id if process_id is not None else jax.process_index()
    base, rem = divmod(n_jobs, pc)
    start = pid * base + min(pid, rem)
    return JobSlice(start, start + base + (1 if pid < rem else 0), n_jobs)


def global_from_local(mesh: Mesh, axis: str, local_rows: np.ndarray):
    """Stitch per-process host arrays into one global array sharded along
    ``axis`` (jax.make_array_from_process_local_data); single-process
    falls back to device_put with the same sharding."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(sharding, local_rows)


__all__ = [
    "initialize", "is_multiprocess", "pod_mesh", "JobSlice",
    "local_job_slice", "global_from_local",
]

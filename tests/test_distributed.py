"""parallel/distributed.py: pod mesh construction, job partitioning, and
per-process array stitching (single-process semantics; the multi-process
paths are exercised structurally — jax.distributed itself needs a real
cluster)."""

import os

import jax
import numpy as np
import pytest

from masp_tpu.parallel import distributed as D


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.delenv("MASP_COORDINATOR", raising=False)
    monkeypatch.delenv("MASP_NUM_PROCESSES", raising=False)
    monkeypatch.setattr(D, "_initialized", False)
    assert D.initialize() is False
    # idempotent
    assert D.initialize() is False
    assert not D.is_multiprocess()


def test_pod_mesh_axes():
    n = len(jax.devices())
    mesh = D.pod_mesh()
    assert mesh.axis_names == ("msm",)
    assert mesh.shape["msm"] == n

    if n % 2 == 0:
        mesh = D.pod_mesh({"dp": 2, "msm": -1})
        assert mesh.shape["dp"] == 2
        assert mesh.shape["msm"] == n // 2

    with pytest.raises(ValueError):
        D.pod_mesh({"dp": n + 1, "msm": -1})
    with pytest.raises(ValueError):
        D.pod_mesh({"dp": 7919})


def test_local_job_slice_partitions_exactly():
    for n_jobs in (0, 1, 7, 8, 23):
        for pc in (1, 2, 3, 8):
            slices = [
                D.local_job_slice(n_jobs, process_id=p, process_count=pc)
                for p in range(pc)
            ]
            all_idx = [i for s in slices for i in s.indices()]
            assert all_idx == list(range(n_jobs))
            # balanced: sizes differ by at most one
            sizes = [len(s) for s in slices]
            assert max(sizes) - min(sizes) <= 1


def test_global_from_local_shards_rows():
    n = len(jax.devices())
    mesh = D.pod_mesh({"dp": n})
    rows = np.arange(4 * n * 3, dtype=np.float32).reshape(4 * n, 3)
    arr = D.global_from_local(mesh, "dp", rows)
    assert arr.shape == rows.shape
    np.testing.assert_array_equal(np.asarray(arr), rows)
    assert len(arr.sharding.device_set) == n


@pytest.mark.skipif(
    os.environ.get("MASP_DISTRIBUTED") != "1",
    reason="multi-process run is slow (XLA mesh-prover compile); MASP_DISTRIBUTED=1",
)
def test_two_process_distributed_demo():
    """Actually executes jax.distributed.initialize across 2 local
    processes (tools/distributed_demo.py): pod_mesh over 2x4 CPU devices,
    local_job_slice/global_from_local, a shard_map psum, and the real mesh
    prover checked against the host bigint reference on every process."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "distributed_demo.py")],
        capture_output=True, text=True, timeout=3600, cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert proc.stdout.count("DISTRIBUTED DEMO PASS") == 2

"""parallel/distributed.py: pod mesh construction, job partitioning, and
per-process array stitching (single-process semantics; the multi-process
paths are exercised structurally — jax.distributed itself needs a real
cluster)."""

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

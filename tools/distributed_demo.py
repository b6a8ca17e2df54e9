"""Real multi-process jax.distributed run: N local CPU processes (default 4).

The reference's only parallelism is in-process rayon (Cargo.lock:1354-1382);
the TPU-native scale-out story is JAX's multi-controller runtime
(masp_tpu/parallel/distributed.py). This tool actually EXECUTES that path:
it launches N worker processes (each with its own CPU devices via
--xla_force_host_platform_device_count, 8 global devices total), wires them
through ``jax.distributed.initialize`` on a 127.0.0.1 coordinator, builds a
``pod_mesh`` over the global devices, and runs:

1. ``local_job_slice`` — per-process partition of a global proof batch,
2. ``global_from_local`` — per-process host rows stitched into one global
   sharded array, reduced with a shard_map psum, checked vs the host sum,
3. the REAL mesh prover (groth16.prover.create_proof_from_assembly with
   mesh=) over the global mesh, checked against the pure-host bigint
   reference prover (groth16/reference.py) on every process,
4. a dp-sharded BATCH prove — the north star's 2-host usage pattern: each
   process proves its local_job_slice of a 2N-proof batch through the real
   pipelined batch prover, the 192-byte proofs allgather across processes
   (multihost_utils.process_allgather — the DCN collective), and every
   process runs one BatchValidator-style verify_proofs_batch over the full
   batch (+ a corrupted-input negative check).

Run:  python tools/distributed_demo.py [--nproc N]   (parent; default N=4)
      python tools/distributed_demo.py --worker I N PORT   (internal)

Gated test: tests/test_distributed.py (MASP_DISTRIBUTED=1).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GLOBAL_DEVICES = 8  # nproc * devices_per_proc; matches the dryrun mesh size


def _devices_per_proc(nproc: int) -> int:
    assert GLOBAL_DEVICES % nproc == 0, (GLOBAL_DEVICES, nproc)
    return GLOBAL_DEVICES // nproc


def worker(pid: int, nproc: int, port: int) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, REPO)
    from masp_tpu.parallel import distributed as D

    started = D.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert started, "expected a multi-process runtime"
    assert jax.process_count() == nproc, jax.process_count()
    n_global = jax.device_count()
    n_local = len(jax.local_devices())
    assert n_global == nproc * _devices_per_proc(nproc), (n_global, n_local)
    print(f"[p{pid}] initialized: {jax.process_count()} processes, "
          f"{n_global} global / {n_local} local devices", flush=True)

    import numpy as np

    from masp_tpu.ops import field_jax as F

    F.set_impl("compact")

    # 1. job partitioning: 6 jobs over the processes (contiguous blocks)
    sl = D.local_job_slice(6)
    all_slices = [D.local_job_slice(6, process_id=i, process_count=nproc)
                  for i in range(nproc)]
    covered = sorted(i for s in all_slices for i in s.indices())
    assert covered == list(range(6)), covered
    print(f"[p{pid}] job slice: {sl.start}..{sl.stop} of {sl.global_size}",
          flush=True)

    # 2. global_from_local + a sharded psum checked against the host sum
    mesh = D.pod_mesh({"msm": -1})
    assert mesh.shape["msm"] == n_global
    rows_per_dev = 2
    local_rows = np.arange(
        pid * n_local * rows_per_dev, (pid + 1) * n_local * rows_per_dev,
        dtype=np.int32,
    ).reshape(n_local * rows_per_dev, 1)
    garr = D.global_from_local(mesh, "msm", local_rows)
    assert garr.shape == (n_global * rows_per_dev, 1)

    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P("msm"),), out_specs=P())
    def total(x):
        return jax.lax.psum(x.sum(), "msm")

    got = int(total(garr))
    want = sum(range(n_global * rows_per_dev))
    assert got == want, (got, want)
    print(f"[p{pid}] global psum over DCN-style mesh OK ({got})", flush=True)

    # 3. the real mesh prover over the global mesh vs the host reference
    from masp_tpu.curves.bls12_381 import G1, G2, R
    from masp_tpu.groth16 import prover as PR
    from masp_tpu.groth16.generator import _add_input_constraints, _densities
    from masp_tpu.groth16.reference import host_proof
    from masp_tpu.groth16.structures import Parameters, VerifyingKey
    from masp_tpu.r1cs.cs import ONE, ProvingAssembly, lc_var

    PR.MSM_C = 4
    PR._JIT_CACHE.clear()

    class Chain:
        def __init__(self, x0=777):
            self.x0 = x0

        def synthesize(self, cs):
            v = cs.alloc("x0", self.x0)
            cur = self.x0
            for i in range(12):
                nxt = cur * cur % R
                nv = cs.alloc(f"x{i+1}", nxt)
                cs.enforce(f"sq{i}", lc_var(v), lc_var(v), lc_var(nv))
                v, cur = nv, nxt
            out = cs.alloc_input("out", cur)
            cs.enforce("out", lc_var(v), lc_var(ONE), lc_var(out))

    cs = ProvingAssembly()
    Chain().synthesize(cs)
    _add_input_constraints(cs)
    m = 1 << (cs.num_constraints - 1).bit_length()
    a_density, b_density = _densities(cs)

    rng = np.random.default_rng(7)  # same seed on every process
    g1 = lambda: G1.generator() * int(rng.integers(1, 1 << 40))
    g2 = lambda: G2.generator() * int(rng.integers(1, 1 << 40))
    vk = VerifyingKey(
        alpha_g1=g1(), beta_g1=g1(), beta_g2=g2(), gamma_g2=g2(),
        delta_g1=g1(), delta_g2=g2(), ic=[g1() for _ in range(cs.num_inputs)],
    )
    params = Parameters(
        vk=vk,
        h=[g1() for _ in range(m - 1)],
        l=[g1() for _ in range(cs.num_aux)],
        a=[g1() for _ in range(int(a_density.sum()))],
        b_g1=[g1() for _ in range(int(b_density.sum()))],
        b_g2=[g2() for _ in range(int(b_density.sum()))],
    )

    proof = PR.create_proof_from_assembly(cs, params, 11, 22, mesh=mesh)
    assert proof == host_proof(cs, params, 11, 22), (
        "multi-process mesh prover disagrees with the host reference"
    )
    print(f"[p{pid}] mesh prove over {nproc} processes x "
          f"{n_local} devices OK: proof == host bigint reference", flush=True)

    # 4. dp-sharded batch prove: each process proves its local_job_slice
    # of a global proof batch through the real pipelined batch prover
    # (local devices), the 192-byte proofs allgather across processes
    # (the DCN collective of the north star's 2-host config), and every
    # process batch-verifies the full batch.
    from jax.experimental import multihost_utils

    from masp_tpu.groth16.generator import generate_random_parameters
    from masp_tpu.groth16.prover import (
        create_proofs_from_assemblies, synthesize_witness,
    )
    from masp_tpu.groth16.structures import Proof, prepare_verifying_key
    from masp_tpu.groth16.verifier import verify_proofs_batch
    from masp_tpu.utils.rng import XorShiftRng

    # step 3's params are arbitrary points (enough to check the mesh MSM
    # arithmetic against host_proof, but NOT a consistent CRS); real
    # verification needs generated parameters. Deterministic seed -> every
    # process generates the identical CRS locally, no parameter broadcast.
    grng = XorShiftRng.from_seed(bytes(range(16, 32)))
    params = generate_random_parameters(Chain(), grng)

    n_jobs = 2 * nproc
    jobs = D.local_job_slice(n_jobs)
    x0s = [700 + j for j in range(n_jobs)]
    outs = [pow(x, 1 << 12, R) for x in x0s]

    def assemblies():
        for j in jobs.indices():
            yield synthesize_witness(Chain(x0s[j]))

    rs_local = [(11 + j, 22 + j) for j in jobs.indices()]
    local_proofs = create_proofs_from_assemblies(assemblies(), params, rs_local)
    local_rows192 = np.stack(
        [np.frombuffer(p.write(), dtype=np.uint8) for p in local_proofs]
    )
    print(f"[p{pid}] dp batch prove: jobs {jobs.start}..{jobs.stop} of "
          f"{n_jobs} proved locally", flush=True)

    gathered = multihost_utils.process_allgather(local_rows192, tiled=True)
    assert gathered.shape == (n_jobs, local_rows192.shape[1]), gathered.shape
    all_proofs = [Proof.read(bytes(gathered[j])) for j in range(n_jobs)]

    pvk = prepare_verifying_key(params.vk)
    vrng = XorShiftRng.from_seed(bytes(range(16)))
    assert verify_proofs_batch(pvk, vrng, all_proofs, [[o] for o in outs]), (
        "gathered dp proof batch failed batch verification"
    )
    bad_inputs = [[o] for o in outs]
    bad_inputs[0] = [(outs[0] + 1) % R]
    assert not verify_proofs_batch(pvk, vrng, all_proofs, bad_inputs), (
        "batch verification accepted a corrupted public input"
    )
    print(f"[p{pid}] dp batch of {n_jobs} proofs allgathered + "
          f"batch-verified OK (negative check OK)", flush=True)
    print(f"[p{pid}] DISTRIBUTED DEMO PASS", flush=True)
    return 0


def parent(nproc: int = 4, port: int = 49731) -> int:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_devices_per_proc(nproc)}"
    ).strip()
    # the workers pin CPU in-process (jax.config.update) per the verify
    # skill gotcha: env JAX_PLATFORMS=cpu can hang inside jax init when
    # the axon TPU relay is down
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(i), str(nproc), str(port)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    rc = 0
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        outs.append(out)
        sys.stdout.write(out)
        if p.returncode != 0 or "DISTRIBUTED DEMO PASS" not in out:
            rc = 1
    print("distributed demo:", "PASS" if rc == 0 else "FAIL", flush=True)
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        sys.exit(worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])))
    n = 4
    if "--nproc" in sys.argv:
        n = int(sys.argv[sys.argv.index("--nproc") + 1])
    sys.exit(parent(nproc=n))

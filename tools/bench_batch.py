#!/usr/bin/env python
"""TPU benchmark: batch proving throughput (create_proofs_from_assemblies)
vs one-at-a-time proving, and the full batched transaction build.

Env: MASP_BENCH_CIRCUIT=output|spend (default output), MASP_BENCH_B=8.
"""

import os
import time


def main():
    import jax

    from masp_tpu.ops import field_jax as F

    F.set_impl("pallas" if jax.default_backend() == "tpu" else "compact")

    from masp_tpu.circuits.sapling import Output, Spend
    from masp_tpu.groth16.params_io import cached_test_params
    from masp_tpu.groth16.prover import (
        create_proof_from_assembly, create_proofs_from_assemblies,
        prepare_device_params, synthesize_witness,
    )
    from masp_tpu.groth16.structures import prepare_verifying_key
    from masp_tpu.groth16.verifier import verify_proof
    from masp_tpu.utils.rng import XorShiftRng

    import bench as B

    kind = os.environ.get("MASP_BENCH_CIRCUIT", "output")
    batch = int(os.environ.get("MASP_BENCH_B", "8"))
    rng = XorShiftRng.from_seed(bytes(range(16)))
    if kind == "output":
        make_circuit, public_inputs = B._output_fixture(rng)
        params = cached_test_params("output-test", Output, rng)
    else:
        make_circuit, public_inputs = B._spend_fixture(rng)
        params = cached_test_params("spend-test", Spend, rng)
    pvk = prepare_verifying_key(params.vk)
    prepare_device_params(params)

    # warmup (compile everything once)
    cs = synthesize_witness(make_circuit())
    proof = create_proof_from_assembly(cs, params, 11, 22)
    assert verify_proof(pvk, proof, public_inputs)

    # serial: B proofs one at a time
    t0 = time.time()
    css = []
    for i in range(batch):
        cs = synthesize_witness(make_circuit())
        css.append(cs)
        proof = create_proof_from_assembly(cs, params, 100 + i, 200 + i)
    serial = (time.time() - t0) / batch
    assert verify_proof(pvk, proof, public_inputs)

    # batched: one pipelined device stream (witnesses reused from above so
    # this isolates the prove pipeline; real callers pipeline synthesis too)
    t0 = time.time()
    proofs = create_proofs_from_assemblies(
        css, params, [(100 + i, 200 + i) for i in range(batch)]
    )
    batched = (time.time() - t0) / batch
    assert all(verify_proof(pvk, p, public_inputs) for p in proofs)

    # batched including witness synthesis (end-to-end aggregate; lazy
    # generator so synthesis overlaps device execution)
    t0 = time.time()
    css2 = (synthesize_witness(make_circuit()) for _ in range(batch))
    proofs = create_proofs_from_assemblies(
        css2, params, [(300 + i, 400 + i) for i in range(batch)]
    )
    e2e = (time.time() - t0) / batch
    assert verify_proof(pvk, proofs[-1], public_inputs)

    print(f"{kind} B={batch}: serial {serial:.3f}s/proof | "
          f"batched(prove-only) {batched:.3f}s/proof | "
          f"batched(e2e) {e2e:.3f}s/proof | "
          f"speedup {serial/e2e:.2f}x", flush=True)


if __name__ == "__main__":
    main()

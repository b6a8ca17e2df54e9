#!/usr/bin/env python
"""Batch-verification benchmark: host vs device pairing, host vs device
RedJubjub signature batches.

Mirrors the reference's node-side throughput path (BatchValidator,
masp_proofs/src/sapling/verifier/batch.rs): one randomized Groth16 batch
check over B proofs + the signature batches. Uses the cached Output test
parameters (run bench.py MASP_BENCH_CIRCUIT=output first) and one real
proof replicated B times — identical arithmetic load to B distinct proofs.

Prints one JSON line per configuration.

Env: MASP_VERIFY_BATCH (default 8), MASP_VERIFY_ITERS (default 3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from masp_tpu.ops import field_jax as F

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    F.set_impl("pallas" if on_tpu else "compact")

    import bench as B
    from masp_tpu.circuits.sapling import Output
    from masp_tpu.groth16.params_io import cached_test_params
    from masp_tpu.groth16.prover import create_proof_from_assembly, synthesize_witness
    from masp_tpu.groth16.structures import prepare_verifying_key
    from masp_tpu.groth16.verifier import verify_proofs_batch
    from masp_tpu.primitives import redjubjub as RJ
    from masp_tpu.primitives.constants import spending_key_generator
    from masp_tpu.fields import JubjubFr
    from masp_tpu.utils.rng import XorShiftRng

    batch = int(os.environ.get("MASP_VERIFY_BATCH", "8"))
    iters = int(os.environ.get("MASP_VERIFY_ITERS", "3"))

    rng = XorShiftRng.from_seed(bytes(range(16)))
    make_circuit, public_inputs = B._output_fixture(rng)
    params = cached_test_params("output-test", Output, rng)
    pvk = prepare_verifying_key(params.vk)
    cs = synthesize_witness(make_circuit())
    proof = create_proof_from_assembly(cs, params, 7, 9)

    proofs = [proof] * batch
    inputs = [public_inputs] * batch

    from masp_tpu.utils import benchlog

    def timed(name, fn):
        ok = fn()  # warmup (compiles on first device use)
        assert ok, f"{name}: batch rejected"
        samples = []
        for _ in range(iters):
            t0 = time.time()
            assert fn()
            samples.append(time.time() - t0)
        dt = sorted(samples)[len(samples) // 2]
        benchlog.emit({
            "metric": f"batch-verify {name} (B={batch})",
            "value": round(dt * 1000 / batch, 2),
            "unit": "ms/proof",
        }, samples)

    timed("groth16 host-pairing", lambda: verify_proofs_batch(
        pvk, XorShiftRng.from_seed(b"\x01" * 16), proofs, inputs))
    # The chunked device pairing is bit-exact but pays hundreds of small
    # sequential dispatches through the axon relay (~292 s per batch
    # measured at B=1) — skippable when only the other paths are wanted.
    if os.environ.get("MASP_VERIFY_SKIP_DEVICE_PAIRING") != "1":
        timed("groth16 device-pairing", lambda: verify_proofs_batch(
            pvk, XorShiftRng.from_seed(b"\x02" * 16), proofs, inputs,
            use_device_pairing=True))

    # RedJubjub signature batch (spend-auth shaped)
    p_g = spending_key_generator()
    entries = []
    for i in range(batch):
        sk = RJ.PrivateKey(JubjubFr(3 + i))
        vk = RJ.PublicKey.from_private(sk, p_g)
        msg = bytes([i]) * 32
        entries.append(RJ.BatchEntry(vk=vk, msg=msg, sig=sk.sign(msg, rng, p_g)))
    timed("redjubjub host", lambda: RJ.batch_verify(
        XorShiftRng.from_seed(b"\x03" * 16), entries, p_g, use_device=False))
    timed("redjubjub device-msm", lambda: RJ.batch_verify(
        XorShiftRng.from_seed(b"\x04" * 16), entries, p_g, use_device=True))


if __name__ == "__main__":
    sys.exit(main())

"""Groth16 end-to-end on a small circuit (CPU, compact impl).

Mirrors the reference's strategy of generating fresh random parameters per
circuit (benches/sapling.rs:24-36). Marked slow: one prove+verify plus
negative checks.
"""

import io
import os

import pytest

from masp_tpu.fields import SCALAR_MODULUS as R
from masp_tpu.groth16.generator import generate_random_parameters
from masp_tpu.groth16.prover import create_random_proof
from masp_tpu.groth16.structures import Parameters, Proof, prepare_verifying_key
from masp_tpu.groth16.verifier import verify_proof, verify_proofs_batch
from masp_tpu.r1cs.cs import ONE, lc_var
from masp_tpu.utils.rng import XorShiftRng


class CubicCircuit:
    """x^3 + x + 5 == out."""

    def __init__(self, x=None):
        self.x = x

    def synthesize(self, cs):
        x = self.x
        xv = cs.alloc("x", x)
        x2 = cs.alloc("x2", None if x is None else x * x % R)
        cs.enforce("x2", lc_var(xv), lc_var(xv), lc_var(x2))
        x3 = cs.alloc("x3", None if x is None else pow(x, 3, R))
        cs.enforce("x3", lc_var(x2), lc_var(xv), lc_var(x3))
        out_val = None if x is None else (pow(x, 3, R) + x + 5) % R
        out = cs.alloc_input("out", out_val)
        cs.enforce("out", lc_var(x3) + xv + (5, ONE), lc_var(ONE), lc_var(out))


def test_groth16_end_to_end():
    """Always-on minimal real-prover e2e: fresh params for a tiny circuit,
    one real prove through create_proof_from_assembly's device path, one
    verify (host pairing), negative checks and serialization round-trips.
    The reference runs its real prover in every bellperson test; this keeps
    the default suite exercising prove+verify on every run. Program traces
    are shared in-process with tests/test_cross_verify.py (same tiny
    shapes), so the marginal suite cost is the ~seconds of param-gen."""
    rng = XorShiftRng.from_seed(bytes(range(16)))
    params = generate_random_parameters(CubicCircuit(), rng)
    pvk = prepare_verifying_key(params.vk)

    proof = create_random_proof(CubicCircuit(x=3), params, rng)
    assert verify_proof(pvk, proof, [3**3 + 3 + 5])
    assert not verify_proof(pvk, proof, [36])
    assert not verify_proof(pvk, proof, [])  # wrong input count

    # serialization round-trips (bellman formats)
    assert Proof.read(proof.write()) == proof
    params2 = Parameters.read(io.BytesIO(params.write()))
    assert params2.vk == params.vk
    assert params2.h == params.h and params2.a == params.a

    # batch verification accepts the proof and rejects corrupted inputs
    assert verify_proofs_batch(pvk, rng, [proof], [[35]])
    assert not verify_proofs_batch(pvk, rng, [proof], [[36]])


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("MASP_E2E"),
    reason="device-pairing compiles are minutes on CPU; run with MASP_E2E=1",
)
def test_groth16_device_pairing_batch():
    rng = XorShiftRng.from_seed(bytes(range(16)))
    params = generate_random_parameters(CubicCircuit(), rng)
    pvk = prepare_verifying_key(params.vk)
    proof = create_random_proof(CubicCircuit(x=3), params, rng)

    # the device-pairing batch path agrees on both outcomes
    assert verify_proofs_batch(pvk, rng, [proof], [[35]], use_device_pairing=True)
    assert not verify_proofs_batch(
        pvk, rng, [proof], [[36]], use_device_pairing=True
    )

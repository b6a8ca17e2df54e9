"""BatchValidator unit coverage (groth16/sapling_prover.py; reference
masp_proofs/src/sapling/verifier/batch.rs): bundle ingestion hardening,
signature-batch semantics (host and device paths), and stage ordering —
all without circuit parameters (the Groth16 stage is stubbed; real-proof
batch verification is covered by the gated e2e tests and
tools/bench_verify.py)."""

import random

import pytest

from masp_tpu.curves.bls12_381 import G1, G2
from masp_tpu.curves.jubjub import ExtendedPoint
from masp_tpu.fields import JubjubFr, Scalar
from masp_tpu.groth16 import sapling_prover as SP
from masp_tpu.groth16.sapling_prover import BatchValidator
from masp_tpu.groth16.structures import Proof
from masp_tpu.primitives import redjubjub as RJ
from masp_tpu.primitives.constants import spending_key_generator
from masp_tpu.primitives.sapling import Nullifier
from masp_tpu.transaction.components.sapling import (
    Authorized, Bundle, SpendDescription,
)
from masp_tpu.transaction.amount import I128, ValueSum

SIGHASH = b"\x07" * 32


class _Rng:
    def __init__(self, seed):
        self.r = random.Random(seed)

    def fill_bytes(self, n):
        return self.r.randbytes(n)


def _decodable_proof(rng) -> bytes:
    """192 bytes that Proof.try_read accepts (random subgroup points)."""
    from masp_tpu.curves.bls12_381 import R

    p = Proof(
        a=G1.generator() * rng.r.randrange(1, R),
        b=G2.generator() * rng.r.randrange(1, R),
        c=G1.generator() * rng.r.randrange(1, R),
    )
    return p.write()


def _spend_bundle(rng, good_sig: bool = True, bad_proof: bool = False,
                  small_order_cv: bool = False) -> Bundle:
    from masp_tpu.primitives.constants import value_commitment_randomness_generator

    p_g = spending_key_generator()
    r_g = value_commitment_randomness_generator()
    ask = RJ.PrivateKey(JubjubFr(rng.r.randrange(1, 1 << 60)))
    rk = RJ.PublicKey.from_private(ask, p_g)
    msg = rk.point.to_bytes() + SIGHASH
    sig = ask.sign(msg if good_sig else b"wrong" + msg, rng, p_g)
    # binding key: pick bsk and make cv = bvk, so with value_balance = 0 the
    # validator's bvk (= cv_sum) matches the key the binding sig uses
    bsk = RJ.PrivateKey(JubjubFr(rng.r.randrange(1, 1 << 60)))
    bvk = RJ.PublicKey.from_private(bsk, r_g)
    cv = (
        ExtendedPoint.from_affine(Scalar(0), Scalar(Scalar.META.modulus - 1))
        if small_order_cv
        else bvk.point
    )
    binding_sig = bsk.sign(bvk.point.to_bytes() + SIGHASH, rng, r_g)
    zkproof = b"\x00" * 192 if bad_proof else _decodable_proof(rng)
    spend = SpendDescription(
        cv=cv, anchor=Scalar(5), nullifier=Nullifier(rng.fill_bytes(32)),
        rk=rk, zkproof=zkproof, spend_auth_sig=sig,
    )
    return Bundle(
        shielded_spends=[spend], shielded_converts=[], shielded_outputs=[],
        value_balance=ValueSum.zero(I128),
        authorization=Authorized(binding_sig=binding_sig),
    )


def test_check_bundle_rejects_malformed_proof():
    v = BatchValidator()
    assert v.check_bundle(_spend_bundle(_Rng(1), bad_proof=True), SIGHASH) is False


def test_check_bundle_rejects_small_order_cv():
    v = BatchValidator()
    assert v.check_bundle(_spend_bundle(_Rng(2), small_order_cv=True), SIGHASH) is False


def test_empty_validator_accepts():
    assert BatchValidator().validate(None, None, None) is True


@pytest.mark.parametrize("use_device_sigs", [False, True])
def test_validate_signature_stage(monkeypatch, use_device_sigs):
    """Good spend-auth sigs reach the Groth16 stage; bad sigs fail before
    it (vks are never touched on the failure path). Device and host
    signature batches agree."""
    reached = []

    def fake_batch(vk, rng, proofs, inputs, use_device_pairing=False):
        reached.append(len(proofs))
        return True

    monkeypatch.setattr(SP, "verify_proofs_batch", fake_batch)

    v = BatchValidator()
    assert v.check_bundle(_spend_bundle(_Rng(3), good_sig=True), SIGHASH)
    assert v.validate("svk", "cvk", "ovk",
                      rng=_Rng(4), use_device_sigs=use_device_sigs) is True
    assert reached == [1]  # one spend proof made it to the Groth16 stage

    reached.clear()
    v2 = BatchValidator()
    assert v2.check_bundle(_spend_bundle(_Rng(5), good_sig=False), SIGHASH)
    assert v2.validate(None, None, None,
                       rng=_Rng(6), use_device_sigs=use_device_sigs) is False
    assert reached == []  # signature failure short-circuits

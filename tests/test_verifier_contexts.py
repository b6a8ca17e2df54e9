"""Verification-context logic (balance equation, binding sig) and ZIP-339."""

import pytest

from masp_tpu.curves.jubjub import ExtendedPoint
from masp_tpu.fields import JubjubFr
from masp_tpu.groth16.sapling_prover import (
    SaplingProvingContext, SaplingVerificationContext, masp_compute_value_balance,
)
from masp_tpu.primitives import redjubjub
from masp_tpu.primitives.asset_type import AssetType
from masp_tpu.primitives.constants import value_commitment_randomness_generator
from masp_tpu.primitives.zip339 import Mnemonic, MnemonicError
from masp_tpu.transaction.amount import I128, ValueSum
from masp_tpu.utils.rng import XorShiftRng

ASSET = AssetType.new(b"ctx-test")


def test_value_balance_point():
    vb = masp_compute_value_balance(ASSET, 100)
    neg = masp_compute_value_balance(ASSET, -100)
    assert vb is not None and neg is not None
    assert (vb + neg).is_identity()
    assert masp_compute_value_balance(ASSET, -(2**127)) is None


def test_binding_sig_roundtrip():
    """Prover context accumulates cv/bsk; verifier recomputes bvk and checks
    the signature (the bvk equation from verifier.rs:173-203)."""
    rng = XorShiftRng.from_seed(bytes(range(16)))
    ctx = SaplingProvingContext()
    # mimic one spend (value 500) and one output (value 300): balance 200
    rcv_s, rcv_o = JubjubFr(111), JubjubFr(222)
    ctx.bsk = ctx.bsk + rcv_s
    cv_s = ASSET.value_commitment(500, rcv_s).commitment()
    ctx.cv_sum = ctx.cv_sum + cv_s
    ctx.bsk = ctx.bsk + (-rcv_o)
    cv_o = ASSET.value_commitment(300, rcv_o).commitment()
    ctx.cv_sum = ctx.cv_sum - cv_o

    balance = ValueSum.from_pair(ASSET, 200, I128)
    sighash = b"\x77" * 32
    sig = ctx.binding_sig(balance, sighash, rng)

    vctx = SaplingVerificationContext()
    vctx.cv_sum = cv_s - cv_o
    assert vctx.final_check(balance, sighash, sig)
    # wrong balance fails
    assert not vctx.final_check(ValueSum.from_pair(ASSET, 199, I128), sighash, sig)

    # inconsistent declared balance is rejected by the prover itself
    with pytest.raises(ValueError):
        ctx.binding_sig(ValueSum.from_pair(ASSET, 123, I128), sighash, rng)


def test_zip339_mnemonic_roundtrip():
    words = [f"w{i:04d}" for i in range(2048)]
    entropy = bytes(range(16))
    m = Mnemonic.from_entropy(entropy, wordlist=words)
    assert len(m.phrase.split()) == 12
    m2 = Mnemonic(m.phrase, wordlist=words)
    assert m2.entropy == entropy
    seed = m.to_seed("pw")
    assert len(seed) == 64
    # checksum failure
    bad = m.phrase.split()
    bad[0] = words[(2047 - int(bad[0][1:])) % 2048]
    with pytest.raises(MnemonicError):
        Mnemonic(" ".join(bad), wordlist=words)

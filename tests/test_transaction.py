"""Transaction builder + MASPv5 serialization round-trips (MockTxProver)."""

import pytest

from masp_tpu.fields import JubjubFr, Scalar
from masp_tpu.primitives.asset_type import AssetType
from masp_tpu.primitives.consensus import TEST_NETWORK
from masp_tpu.primitives.memo import MemoBytes
from masp_tpu.primitives.merkle_tree import CommitmentTree, IncrementalWitness
from masp_tpu.primitives.sapling import Rseed
from masp_tpu.primitives.zip32 import ExtendedSpendingKey, PseudoExtendedKey
from masp_tpu.transaction.amount import I128, U64, ValueSum
from masp_tpu.transaction.builder import Builder, InsufficientFunds
from masp_tpu.transaction.components.sapling_builder import (
    RngBuildParams, StoredBuildParams,
)
from masp_tpu.transaction.components.transparent import TransparentAddress, TxOut
from masp_tpu.transaction.fees import FixedFeeRule
from masp_tpu.transaction.transaction import Transaction
from masp_tpu.transaction.tx_prover import MockTxProver
from masp_tpu.utils.encoding import Reader
from masp_tpu.utils.rng import XorShiftRng

HEIGHT = 10  # MASP active on TEST_NETWORK (ZIP-212 rseed)
ASSET = AssetType.new(b"test-asset")


def _funded_builder(rng, value=100000, fee_asset=None):
    xsk = ExtendedSpendingKey.master(b"builder test seed")
    _j, addr = xsk.default_address()
    note = addr.create_note(ASSET, value, Rseed.after_zip212(rng.fill_bytes(32)))
    tree = CommitmentTree.empty()
    tree.append(note.commitment())
    witness = IncrementalWitness.from_tree(tree)
    builder = Builder(TEST_NETWORK, HEIGHT)
    builder.add_sapling_spend(
        PseudoExtendedKey.from_spending_key(xsk), addr.diversifier, note, witness.path()
    )
    return builder, xsk, addr


def test_build_full_transaction_roundtrip():
    rng = XorShiftRng.from_seed(bytes(range(16)))
    builder, xsk, addr = _funded_builder(rng)
    # send some back to ourselves, rest as fee
    fee = ValueSum.from_pair(ASSET, 1000, U64)
    builder.add_sapling_output(
        xsk.expsk.ovk, addr, ASSET, 99000, MemoBytes.empty()
    )
    prover = MockTxProver(real_binding_sig=True)
    tx, meta = builder.build(prover, FixedFeeRule.non_standard(fee), rng, RngBuildParams(rng))

    bundle = tx.sapling_bundle
    assert bundle is not None
    assert len(bundle.shielded_spends) == 1
    assert len(bundle.shielded_outputs) == 2  # padded to MIN_SHIELDED_OUTPUTS
    assert bundle.value_balance.get(ASSET) == 1000  # the fee remains

    # serialization roundtrip preserves txid
    raw = tx.to_bytes()
    tx2 = Transaction.from_bytes(raw)
    assert tx2.txid() == tx.txid()
    assert tx2.to_bytes() == raw
    assert tx2.sapling_bundle == tx.sapling_bundle

    # spend auth sig verifies against rk over the sighash
    from masp_tpu.primitives.constants import spending_key_generator
    from masp_tpu.transaction.sighash import SignableInput, signature_hash
    from masp_tpu.transaction.txid import TxIdDigester

    txid_parts = tx.data.digest(TxIdDigester())
    sighash = signature_hash(tx.data, SignableInput.shielded(), txid_parts)
    spend = bundle.shielded_spends[0]
    assert spend.rk.verify(
        spend.rk.point.to_bytes() + sighash, spend.spend_auth_sig, spending_key_generator()
    )

    # binding signature verifies (mock prover produced real cv/bsk)
    from masp_tpu.groth16.sapling_prover import masp_compute_value_balance
    from masp_tpu.primitives import redjubjub
    from masp_tpu.primitives.constants import value_commitment_randomness_generator
    from masp_tpu.curves.jubjub import ExtendedPoint

    cv_sum = ExtendedPoint.identity()
    for s in bundle.shielded_spends:
        cv_sum = cv_sum + s.cv
    for o in bundle.shielded_outputs:
        cv_sum = cv_sum - o.cv
    for asset, v in bundle.value_balance.components():
        cv_sum = cv_sum - masp_compute_value_balance(asset, v)
    bvk = redjubjub.PublicKey(cv_sum)
    assert bvk.verify(
        cv_sum.to_bytes() + sighash,
        bundle.authorization.binding_sig,
        value_commitment_randomness_generator(),
    )


def test_insufficient_funds():
    rng = XorShiftRng.from_seed(bytes(range(16, 32)))
    builder, xsk, addr = _funded_builder(rng, value=100)
    builder.add_sapling_output(None, addr, ASSET, 200, MemoBytes.empty())
    with pytest.raises(InsufficientFunds):
        builder.build(
            MockTxProver(real_binding_sig=True),
            FixedFeeRule.non_standard(ValueSum.zero(U64)),
            rng,
            RngBuildParams(rng),
        )


def test_stored_build_params_reproduce_transaction():
    """StoredBuildParams: replaying randomness rebuilds identical descriptions
    (deterministic rebuild, SURVEY.md §5.4)."""
    rng1 = XorShiftRng.from_seed(bytes(range(32, 48)))
    builder1, xsk, addr = _funded_builder(rng1)
    builder1.add_sapling_output(None, addr, ASSET, 100000, MemoBytes.empty())
    bparams = RngBuildParams(XorShiftRng.from_seed(b"B" * 16))
    prover = MockTxProver(real_binding_sig=True)
    tx1, _ = builder1.build(
        prover, FixedFeeRule.non_standard(ValueSum.zero(U64)),
        XorShiftRng.from_seed(b"R" * 16), bparams,
    )
    stored = bparams.to_stored()

    rng2 = XorShiftRng.from_seed(bytes(range(32, 48)))
    builder2, _xsk, addr2 = _funded_builder(rng2)
    builder2.add_sapling_output(None, addr2, ASSET, 100000, MemoBytes.empty())
    tx2, _ = builder2.build(
        prover, FixedFeeRule.non_standard(ValueSum.zero(U64)),
        XorShiftRng.from_seed(b"R" * 16), stored,
    )
    assert tx1.txid() == tx2.txid()
    assert tx1.to_bytes() == tx2.to_bytes()


def test_transparent_only_transaction():
    rng = XorShiftRng.from_seed(bytes(range(48, 64)))
    builder = Builder(TEST_NETWORK, HEIGHT)
    addr20 = TransparentAddress(b"\x01" * 20)
    builder.add_transparent_input(TxOut(ASSET, 500, addr20))
    builder.add_transparent_output(addr20, ASSET, 400)
    fee = ValueSum.from_pair(ASSET, 100, U64)
    tx, _ = builder.build(
        MockTxProver(real_binding_sig=True), FixedFeeRule.non_standard(fee),
        rng, RngBuildParams(rng),
    )
    assert tx.sapling_bundle is None
    assert tx.transparent_bundle is not None
    raw = tx.to_bytes()
    tx2 = Transaction.from_bytes(raw)
    assert tx2.txid() == tx.txid()
    assert tx2.transparent_bundle == tx.transparent_bundle

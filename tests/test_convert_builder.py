"""Builder path for MASP conversions (add_sapling_convert), previously
untested: burn/mint via an AllowedConversion note, full build with
MockTxProver, wire round-trip with the convert description present
(reference: masp_primitives builder.rs convert support +
sapling/builder.rs ConvertDescriptionInfo)."""

from masp_tpu.primitives.asset_type import AssetType
from masp_tpu.primitives.consensus import TEST_NETWORK
from masp_tpu.primitives.convert import AllowedConversion
from masp_tpu.primitives.memo import MemoBytes
from masp_tpu.primitives.merkle_tree import CommitmentTree, IncrementalWitness
from masp_tpu.primitives.sapling import Rseed
from masp_tpu.primitives.zip32 import ExtendedSpendingKey, PseudoExtendedKey
from masp_tpu.transaction.amount import I128, U64, ValueSum
from masp_tpu.transaction.builder import Builder
from masp_tpu.transaction.components.sapling_builder import RngBuildParams
from masp_tpu.transaction.fees import FixedFeeRule
from masp_tpu.transaction.transaction import Transaction
from masp_tpu.transaction.tx_prover import MockTxProver
from masp_tpu.utils.rng import XorShiftRng

HEIGHT = 10


def _build_convert_tx():
    rng = XorShiftRng.from_seed(bytes(range(16)))
    xsk = ExtendedSpendingKey.master(b"convert wallet seed")
    _idx, addr = xsk.default_address()

    asset_a = AssetType.new(b"asset-A")
    asset_b = AssetType.new(b"asset-B")

    # fund: 10_000 A
    note = addr.create_note(asset_a, 10_000, Rseed.after_zip212(rng.fill_bytes(32)))
    tree = CommitmentTree.empty()
    tree.append(note.commitment())
    witness = IncrementalWitness.from_tree(tree)

    # allowed conversion: burn 1 A -> mint 2 B, applied 2_000 times
    allowed = AllowedConversion.from_assets(
        ValueSum.from_pair(asset_a, -1, I128) + ValueSum.from_pair(asset_b, 2, I128)
    )
    ctree = CommitmentTree.empty()
    ctree.append(allowed.commitment())
    cwitness = IncrementalWitness.from_tree(ctree)

    builder = Builder(TEST_NETWORK, HEIGHT)
    builder.add_sapling_spend(
        PseudoExtendedKey.from_spending_key(xsk), addr.diversifier, note,
        witness.path(),
    )
    builder.add_sapling_convert(allowed, 2_000, cwitness.path())
    builder.add_sapling_output(xsk.expsk.ovk, addr, asset_a, 7_000, MemoBytes.empty())
    builder.add_sapling_output(xsk.expsk.ovk, addr, asset_b, 4_000, MemoBytes.empty())

    fee = ValueSum.from_pair(asset_a, 1_000, U64)
    tx, _meta = builder.build(
        MockTxProver(real_binding_sig=True), FixedFeeRule.non_standard(fee),
        rng, RngBuildParams(rng),
    )
    return tx, asset_a, asset_b, allowed


def test_convert_build_and_roundtrip():
    tx, asset_a, asset_b, allowed = _build_convert_tx()
    bundle = tx.sapling_bundle
    assert len(bundle.shielded_spends) == 1
    assert len(bundle.shielded_converts) == 1
    assert len(bundle.shielded_outputs) == 2

    # the bundle's value balance is what the transaction exposes: the fee
    # in A, zero net B (burn/mint cancels against the outputs)
    assert bundle.value_balance.get(asset_a) == 1_000
    assert bundle.value_balance.get(asset_b) == 0

    # convert description carries the conversion-tree anchor
    cdesc = bundle.shielded_converts[0]
    assert not cdesc.cv.is_small_order()

    raw = tx.to_bytes()
    tx2 = Transaction.from_bytes(raw)
    assert tx2.to_bytes() == raw
    assert tx2.txid() == tx.txid()
    c2 = tx2.sapling_bundle.shielded_converts[0]
    assert c2 == cdesc


def test_convert_insufficient_funds():
    import pytest

    from masp_tpu.transaction.builder import InsufficientFunds as BuilderError

    rng = XorShiftRng.from_seed(b"\x11" * 16)
    xsk = ExtendedSpendingKey.master(b"poor wallet")
    _idx, addr = xsk.default_address()
    asset_a = AssetType.new(b"asset-A")
    builder = Builder(TEST_NETWORK, HEIGHT)
    # output with no funding at all
    builder.add_sapling_output(xsk.expsk.ovk, addr, asset_a, 5, MemoBytes.empty())
    with pytest.raises(BuilderError):
        builder.build(
            MockTxProver(real_binding_sig=True),
            FixedFeeRule.non_standard(ValueSum.from_pair(asset_a, 1, U64)),
            rng, RngBuildParams(rng),
        )

"""Borsh schema descriptions vs the reference's hand-written BorshSchema
impls (masp_primitives/src/transaction.rs:382-553, components/amount.rs:
233-280, components/sapling.rs:288-307/427-446/603-617, consensus.rs:290-305)
and the borsh forms that delegate to existing wire formats."""

from masp_tpu.utils import borsh_schema as S


def test_transaction_schema_structure():
    decl, defs = S.schema_container("Transaction")
    assert decl == "Transaction"
    tx = defs["Transaction"]
    names = [n for n, _ in tx.named]
    # transaction.rs:466-553 field order
    assert names == [
        "version", "consensus_branch_id", "lock_time", "expiry_height",
        "vin::count", "vin", "vout::count", "vout",
        "sd_v5s::count", "sd_v5s", "cd_v5s::count", "cd_v5s",
        "od_v5s::count", "od_v5s", "value_balance",
        "spend_anchor", "convert_anchor",
        "v_spend_proofs", "v_spend_auth_sigs", "v_convert_proofs",
        "v_output_proofs", "authorization",
    ]
    # counts are the per-owner CompactSize pseudo-type (1-byte tag enum)
    cs = defs["Transaction::CompactSize"]
    assert cs == S.Enum(
        1, ((253, "u16", "u16"), (254, "u32", "u32"), (255, "u64", "u64"))
    )
    # vectors untagged (length_width 0) — the count travels separately
    assert defs["Transaction::sd_v5s"] == S.Sequence(
        0, (0, S.U64_MAX), "SpendDescriptionV5"
    )
    # options untagged (tag_width 0)
    assert defs["Transaction::value_balance"] == S.Enum(
        0, ((0, "None", "()"), (1, "Some", "ValueSum<AssetType, i128>"))
    )
    assert defs["Transaction::authorization"] == S.Enum(
        0, ((0, "None", "()"), (1, "Some", "Authorized"))
    )
    # proof arrays are fixed [u8; 192]
    assert defs["Transaction::v_spend_proofs"] == S.Sequence(
        0, (0, S.U64_MAX), "[u8; 192]"
    )
    assert defs["[u8; 192]"] == S.Sequence(0, (192, 192), "u8")


def test_leaf_schemas_match_reference():
    _, defs = S.schema_container("Transaction")
    # transaction.rs:181-196
    assert defs["TxVersion"] == S.Struct(
        named=(("header", "u32"), ("version_group_id", "u32"))
    )
    # consensus.rs:290-305: 4-byte tag, single MASP variant
    assert defs["BranchId"] == S.Enum(4, ((0xE9FF75A6, "MASP", "()"),))
    # components/sapling.rs:288-307
    assert defs["SpendDescriptionV5"] == S.Struct(
        named=(("cv", "[u8; 32]"), ("nullifier", "Nullifier"), ("rk", "PublicKey"))
    )
    # components/sapling.rs:427-446 (enc 580+32, out 80)
    out_d = defs["OutputDescriptionV5"]
    assert dict(out_d.named)["enc_ciphertext"] == "[u8; 612]"
    assert dict(out_d.named)["out_ciphertext"] == "[u8; 80]"
    # components/sapling.rs:603-617
    assert defs["ConvertDescriptionV5"] == S.Struct(named=(("cv", "[u8; 32]"),))
    # redjubjub.rs:42-46 (derived) / :78-92 (hand-written)
    assert defs["Signature"] == S.Struct(
        named=(("rbar", "[u8; 32]"), ("sbar", "[u8; 32]"))
    )
    assert defs["PublicKey"] == S.Struct(unnamed=("[u8; 32]",))
    # asset_type.rs:19-24: nonce is #[borsh(skip)]
    assert defs["AssetType"] == S.Struct(named=(("identifier", "[u8; 32]"),))
    # transparent.rs:167-187 / :249-267
    assert defs["TxIn<Authorized>"] == defs["TxOut"].__class__(
        named=(
            ("asset_type", "AssetType"),
            ("value", "u64"),
            ("address", "TransparentAddress"),
        )
    )
    assert defs["TransparentAddress"] == S.Struct(unnamed=("[u8; 20]",))
    assert defs["BlockHeight"] == S.Struct(unnamed=("u32",))


def test_value_sum_schema():
    decl, defs = S.schema_container("I128Sum")
    assert decl == "ValueSum<AssetType, i128>"
    vs = defs[decl]
    assert vs == S.Struct(
        unnamed=(f"{decl}::CompactSize", f"{decl}::Sequence")
    )
    assert defs[f"{decl}::Sequence"] == S.Sequence(
        0, (0, S.U64_MAX), "(AssetType, i128)"
    )
    assert defs["(AssetType, i128)"] == S.Tuple(("AssetType", "i128"))
    assert defs["i128"] == S.Primitive(16)


def test_conflicting_definitions_rejected():
    import pytest

    defs = {}
    S.add_definition("X", S.Primitive(1), defs)
    S.add_definition("X", S.Primitive(1), defs)  # idempotent ok
    with pytest.raises(ValueError):
        S.add_definition("X", S.Primitive(2), defs)


def test_value_sum_borsh_roundtrip():
    from masp_tpu.primitives.asset_type import AssetType
    from masp_tpu.transaction.amount import ValueSum
    from masp_tpu.transaction.borsh_io import (
        value_sum_from_borsh, value_sum_to_borsh,
    )

    a = AssetType.new(b"asset-a")
    b = AssetType.new(b"asset-b")
    vs = ValueSum.from_pair(a, 12345) + ValueSum.from_pair(b, -7)
    data = value_sum_to_borsh(vs)
    # CompactSize count (2 < 253 -> single byte) + 2 * (32 + 16)
    assert data[0] == 2 and len(data) == 1 + 2 * 48
    back = value_sum_from_borsh(data)
    assert back == vs
    # borsh deserialize accepts identifiers ValueSum.read would reject
    bogus = bytes([1]) + b"\x00" * 32 + (5).to_bytes(16, "little")
    permissive = value_sum_from_borsh(bogus)
    assert permissive.components()[0][1] == 5


def test_transaction_borsh_is_v5_format():
    """Transaction borsh form == MASPv5 wire format (transaction.rs:352-364)."""
    from masp_tpu.primitives.asset_type import AssetType
    from masp_tpu.primitives.memo import MemoBytes
    from masp_tpu.primitives.merkle_tree import CommitmentTree, IncrementalWitness
    from masp_tpu.primitives.sapling import Rseed
    from masp_tpu.primitives.consensus import TEST_NETWORK
    from masp_tpu.primitives.zip32 import ExtendedSpendingKey, PseudoExtendedKey
    from masp_tpu.transaction.amount import U64, ValueSum
    from masp_tpu.transaction.borsh_io import (
        transaction_from_borsh, transaction_to_borsh,
    )
    from masp_tpu.transaction.builder import Builder
    from masp_tpu.transaction.components.sapling_builder import RngBuildParams
    from masp_tpu.transaction.fees import FixedFeeRule
    from masp_tpu.transaction.tx_prover import MockTxProver
    from masp_tpu.utils.rng import XorShiftRng

    rng = XorShiftRng.from_seed(bytes(range(16)))
    asset = AssetType.new(b"borsh-tx-asset")
    xsk = ExtendedSpendingKey.master(b"borsh tx test seed")
    _j, addr = xsk.default_address()
    note = addr.create_note(asset, 100000, Rseed.after_zip212(rng.fill_bytes(32)))
    tree = CommitmentTree.empty()
    tree.append(note.commitment())
    witness = IncrementalWitness.from_tree(tree)
    builder = Builder(TEST_NETWORK, 10)
    builder.add_sapling_spend(
        PseudoExtendedKey.from_spending_key(xsk), addr.diversifier, note,
        witness.path(),
    )
    builder.add_sapling_output(xsk.expsk.ovk, addr, asset, 99000, MemoBytes.empty())
    fee = ValueSum.from_pair(asset, 1000, U64)
    tx, _meta = builder.build(
        MockTxProver(real_binding_sig=True), FixedFeeRule.non_standard(fee),
        rng, RngBuildParams(rng),
    )

    raw = transaction_to_borsh(tx)
    assert raw == tx.to_bytes()
    tx2 = transaction_from_borsh(raw)
    assert tx2.txid() == tx.txid()
    assert transaction_to_borsh(tx2) == raw

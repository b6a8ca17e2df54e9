"""Borsh serialization: golden-layout vectors + round-trips.

The byte layouts are pinned against the reference impls
(masp_primitives/src/transaction/components/sapling/builder.rs:96-283,
transaction/builder.rs:119-128, components/amount.rs:203-231). Golden
byte strings here are hand-assembled from those layouts, so a layout
regression (field order, length prefixes, tags) fails loudly.
"""

import pytest

from masp_tpu.curves.jubjub import JubjubFr
from masp_tpu.primitives.asset_type import AssetType
from masp_tpu.primitives.keys import ExpandedSpendingKey
from masp_tpu.primitives.memo import MemoBytes
from masp_tpu.primitives.merkle_tree import MerklePath, Node
from masp_tpu.primitives.sapling import Diversifier, Note, Rseed
from masp_tpu.primitives.zip32 import ExtendedSpendingKey
from masp_tpu.transaction import borsh_io as BIO
from masp_tpu.transaction.amount import I64, I128, ValueSum
from masp_tpu.transaction.builder import Builder
from masp_tpu.transaction.components.sapling_builder import (
    ConvertBuildParams, OutputBuildParams, RngBuildParams, SpendBuildParams,
    StoredBuildParams,
)
from masp_tpu.transaction.components.transparent import TransparentAddress
from masp_tpu.utils.encoding import Reader, Writer
from masp_tpu.utils.rng import XorShiftRng


def _addr():
    expsk = ExpandedSpendingKey.from_spending_key(b"\x07" * 32)
    vk = expsk.proof_generation_key().to_viewing_key()
    d = 0
    while True:
        div = Diversifier(d.to_bytes(11, "little"))
        addr = vk.to_payment_address(div)
        if addr is not None:
            return div, addr
        d += 1


def test_stored_build_params_golden_layout():
    """Vec<T> = u32 LE count + items; rcv/alpha/rcm as 32-byte reprs,
    rseed raw 32 (builder.rs:96-283 + borsh derive on StoredBuildParams)."""
    one = JubjubFr(1)
    two = JubjubFr(2)
    p = StoredBuildParams(
        spend_params=[SpendBuildParams(rcv=one, alpha=two)],
        convert_params=[],
        output_params=[OutputBuildParams(rcv=two, rcm=one, rseed=b"\xab" * 32)],
    )
    data = p.to_bytes()
    expect = (
        (1).to_bytes(4, "little") + one.to_bytes() + two.to_bytes()
        + (0).to_bytes(4, "little")
        + (1).to_bytes(4, "little") + two.to_bytes() + one.to_bytes() + b"\xab" * 32
    )
    assert data == expect
    back = StoredBuildParams.from_bytes(data)
    assert back.spend_params[0].rcv == one
    assert back.spend_params[0].alpha == two
    assert back.output_params[0].rseed == b"\xab" * 32
    assert back.convert_params == []


def test_stored_build_params_invalid_scalar_rejected():
    bad = (1).to_bytes(4, "little") + b"\xff" * 64 + (0).to_bytes(4, "little") * 2
    with pytest.raises(ValueError):
        StoredBuildParams.from_bytes(bad)


def test_rng_build_params_to_stored_round_trip():
    rng = XorShiftRng.from_seed(bytes(range(16)))
    rbp = RngBuildParams(rng)
    # touch indices 0..2 to materialize them
    for i in range(3):
        rbp.spend_rcv(i), rbp.spend_alpha(i)
        rbp.convert_rcv(i)
        rbp.output_rcv(i), rbp.output_rcm(i), rbp.output_rseed(i)
    stored = rbp.to_stored()
    back = StoredBuildParams.from_bytes(stored.to_bytes())
    for i in range(3):
        assert back.spend_rcv(i) == stored.spend_rcv(i)
        assert back.spend_alpha(i) == stored.spend_alpha(i)
        assert back.convert_rcv(i) == stored.convert_rcv(i)
        assert back.output_rcv(i) == stored.output_rcv(i)
        assert back.output_rcm(i) == stored.output_rcm(i)
        assert back.output_rseed(i) == stored.output_rseed(i)


def test_value_sum_borsh_golden():
    """ValueSum borsh = CompactSize count + (32-byte id + LE value)
    (amount.rs:203-221 delegating to zcash Vector)."""
    a = AssetType.new(b"gold")
    s = ValueSum.from_pair(a, -5, I64)
    data = s.to_bytes()
    assert data == b"\x01" + a.identifier + (-5).to_bytes(8, "little", signed=True)
    r = Reader(data)
    assert ValueSum.read(r, I64) == s

    s128 = ValueSum.from_pair(a, 1 << 100, I128)
    data = s128.to_bytes()
    assert data == b"\x01" + a.identifier + (1 << 100).to_bytes(16, "little", signed=True)


def test_note_and_rseed_borsh():
    div, addr = _addr()
    atype = AssetType.new(b"silver")
    note = Note(asset_type=atype, value=77, g_d=addr.g_d(), pk_d=addr.pk_d,
                rseed=Rseed.before_zip212(JubjubFr(9)))
    w = Writer()
    BIO.write_note(w, note)
    data = w.getvalue()
    # layout: id(32) value(8 LE) g_d(32) pk_d(32) tag(1) rcm(32)
    assert len(data) == 32 + 8 + 32 + 32 + 1 + 32
    assert data[:32] == atype.identifier
    assert data[32:40] == (77).to_bytes(8, "little")
    assert data[104] == 1  # BeforeZip212 tag
    back = BIO.read_note(Reader(data))
    assert back.asset_type == atype and back.value == 77
    assert back.g_d == note.g_d and back.pk_d == note.pk_d
    assert back.rseed.rcm() == note.rseed.rcm()

    # AfterZip212 tag = 2
    note2 = Note(asset_type=atype, value=1, g_d=addr.g_d(), pk_d=addr.pk_d,
                 rseed=Rseed.after_zip212(b"\x33" * 32))
    w = Writer()
    BIO.write_rseed(w, note2.rseed)
    assert w.getvalue() == b"\x02" + b"\x33" * 32


def test_merkle_path_stream_read_leaves_trailing():
    nodes = [(Node(bytes([i]) * 32), i % 2 == 1) for i in range(4)]
    path = MerklePath(nodes, sum(1 << i for i in range(4) if i % 2 == 1))
    w = Writer()
    path.write(w)
    data = w.getvalue() + b"TRAILER"
    r = Reader(data)
    back = MerklePath.read(r)
    assert [(n.repr, b) for n, b in back.auth_path] == [
        (n.repr, b) for n, b in path.auth_path
    ]
    assert back.position == path.position
    assert r.remaining() == b"TRAILER"


def test_builder_borsh_round_trip():
    """Full Builder (transaction/builder.rs:119-128 derive) with a spend,
    a transparent output, and a shielded output survives borsh."""
    from masp_tpu.primitives.consensus import TEST_NETWORK
    from masp_tpu.primitives.sapling import merkle_hash

    div, addr = _addr()
    atype = AssetType.new(b"borsh-asset")
    extsk = ExtendedSpendingKey.master(b"\x01" * 32)
    note = Note(asset_type=atype, value=100_000, g_d=addr.g_d(), pk_d=addr.pk_d,
                rseed=Rseed.before_zip212(JubjubFr(4)))
    auth_path = [(Node((i + 1).to_bytes(32, "little")), i % 3 == 0) for i in range(32)]
    position = sum(1 << i for i in range(32) if i % 3 == 0)
    path = MerklePath(auth_path, position)

    b = Builder(TEST_NETWORK, target_height=1, expiry_height=40)
    b.add_sapling_spend(extsk, div, note, path)
    b.add_sapling_output(None, addr, atype, 60_000, MemoBytes(b"\x00" * 512))
    b.add_transparent_output(TransparentAddress(b"\x11" * 20), atype, 1_000)

    data = BIO.builder_to_bytes(b)
    back = BIO.builder_from_bytes(data, TEST_NETWORK)
    assert back.target_height == 1 and back.expiry_height == 40
    assert len(back.sapling_builder.spends) == 1
    assert len(back.sapling_builder.outputs) == 1
    assert len(back.transparent_builder.vout) == 1
    sp = back.sapling_builder.spends[0]
    assert sp.extsk.to_bytes() == extsk.to_bytes()
    assert sp.note.value == 100_000
    assert sp.merkle_path.position == position
    assert back.sapling_builder.value_balance == b.sapling_builder.value_balance
    # serialization is stable
    assert BIO.builder_to_bytes(back) == data


def test_sapling_metadata_usize_as_u64():
    from masp_tpu.transaction.components.sapling_builder import SaplingMetadata

    m = SaplingMetadata(spend_indices=[2, 0], convert_indices=[], output_indices=[1])
    w = Writer()
    BIO.write_sapling_metadata(w, m)
    data = w.getvalue()
    expect = (
        (2).to_bytes(4, "little") + (2).to_bytes(8, "little") + (0).to_bytes(8, "little")
        + (0).to_bytes(4, "little")
        + (1).to_bytes(4, "little") + (1).to_bytes(8, "little")
    )
    assert data == expect
    back = BIO.read_sapling_metadata(Reader(data))
    assert back.spend_indices == [2, 0] and back.output_indices == [1]

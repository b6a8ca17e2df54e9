"""Randomized transaction/bundle round-trips — the proptest-breadth
analogue of the reference's arb_tx/arb_bundle strategies
(masp_primitives/src/transaction.rs:866-915,
components/sapling.rs:619-760): many randomly-shaped transactions, not
one deterministic instance.

Python has no proptest; we drive seeded random.Random over a case grid.
Shrinking isn't needed — each case prints its seed on failure."""

import random

import pytest

from masp_tpu.curves.jubjub import ExtendedPoint
from masp_tpu.fields import Scalar
from masp_tpu.note_encryption import ENC_CIPHERTEXT_SIZE, OUT_CIPHERTEXT_SIZE
from masp_tpu.primitives import redjubjub
from masp_tpu.primitives.asset_type import AssetType
from masp_tpu.primitives.constants import spending_key_generator
from masp_tpu.primitives.sapling import Nullifier
from masp_tpu.primitives.zip32 import DiversifierIndex  # noqa: F401 (API presence)
from masp_tpu.transaction.amount import I128, ValueSum
from masp_tpu.transaction.components.sapling import (
    Authorized as SapAuthorized, Bundle as SapBundle, ConvertDescription,
    OutputDescription, SpendDescription,
)
from masp_tpu.primitives.consensus import BranchId
from masp_tpu.transaction.components.transparent import (
    Bundle as TBundle, TransparentAddress, TxIn, TxOut,
)
from masp_tpu.transaction.transaction import Transaction, TransactionData, TxVersion


class _Rng:
    def __init__(self, seed):
        self.r = random.Random(seed)

    def bytes(self, n):
        return self.r.randbytes(n)

    def point(self):
        return spending_key_generator().mul_scalar_int(self.r.randrange(1, 1 << 64))

    def scalar(self):
        return Scalar(self.r.randrange(Scalar.META.modulus))

    def sig(self, msg=b"arb"):
        from masp_tpu.fields import JubjubFr

        sk = redjubjub.PrivateKey(JubjubFr(self.r.randrange(1, 1 << 60)))

        class _R:
            def __init__(s, r):
                s.r = r

            def fill_bytes(s, n):
                return s.r.randbytes(n)

        return sk.sign(msg, _R(self.r), spending_key_generator())

    def asset(self):
        return AssetType.new(b"arb-" + self.bytes(4).hex().encode())


def _arb_spend(g: _Rng, anchor) -> SpendDescription:
    # anchor is bundle-wide: the v5 wire format carries ONE spend anchor
    # (reference arb_bundle shares it too, components/sapling.rs:619-760)
    return SpendDescription(
        cv=g.point(), anchor=anchor, nullifier=Nullifier(g.bytes(32)),
        rk=redjubjub.PublicKey(g.point()), zkproof=g.bytes(192),
        spend_auth_sig=g.sig(),
    )


def _arb_convert(g: _Rng, anchor) -> ConvertDescription:
    return ConvertDescription(cv=g.point(), anchor=anchor, zkproof=g.bytes(192))


def _arb_output(g: _Rng) -> OutputDescription:
    return OutputDescription(
        cv=g.point(), cmu=g.scalar(), ephemeral_key=g.point().to_bytes(),
        enc_ciphertext=g.bytes(ENC_CIPHERTEXT_SIZE),
        out_ciphertext=g.bytes(OUT_CIPHERTEXT_SIZE), zkproof=g.bytes(192),
    )


def _arb_sapling_bundle(g: _Rng) -> SapBundle | None:
    n_spends = g.r.randrange(0, 4)
    n_converts = g.r.randrange(0, 3)
    n_outputs = g.r.randrange(0, 4)
    if n_spends == 0 and n_converts == 0 and n_outputs == 0:
        return None
    vb = ValueSum.zero(I128)
    for _ in range(g.r.randrange(0, 3)):
        vb = vb + ValueSum.from_pair(g.asset(), g.r.randrange(-(1 << 40), 1 << 40))
    spend_anchor, convert_anchor = g.scalar(), g.scalar()
    return SapBundle(
        shielded_spends=[_arb_spend(g, spend_anchor) for _ in range(n_spends)],
        shielded_converts=[_arb_convert(g, convert_anchor) for _ in range(n_converts)],
        shielded_outputs=[_arb_output(g) for _ in range(n_outputs)],
        value_balance=vb,
        authorization=SapAuthorized(binding_sig=g.sig()),
    )


def _arb_transparent_bundle(g: _Rng) -> TBundle | None:
    n_in = g.r.randrange(0, 3)
    n_out = g.r.randrange(0, 3)
    if n_in == 0 and n_out == 0:
        return None
    mk_addr = lambda: TransparentAddress(g.bytes(20))
    return TBundle(
        vin=[
            TxIn(asset_type=g.asset(), value=g.r.randrange(0, 1 << 50),
                 address=mk_addr())
            for _ in range(n_in)
        ],
        vout=[
            TxOut(asset_type=g.asset(), value=g.r.randrange(0, 1 << 50),
                  address=mk_addr())
            for _ in range(n_out)
        ],
    )


def _arb_tx(seed: int) -> Transaction:
    g = _Rng(seed)
    data = TransactionData(
        version=TxVersion(),
        consensus_branch_id=BranchId.MASP,
        lock_time=g.r.randrange(0, 1 << 32),
        expiry_height=g.r.randrange(0, 1 << 31),
        transparent_bundle=_arb_transparent_bundle(g),
        sapling_bundle=_arb_sapling_bundle(g),
    )
    return data.freeze()


@pytest.mark.parametrize("seed", range(25))
def test_arb_tx_roundtrip(seed):
    tx = _arb_tx(seed)
    raw = tx.to_bytes()
    tx2 = Transaction.from_bytes(raw)
    assert tx2.txid() == tx.txid(), f"seed={seed}"
    assert tx2.to_bytes() == raw, f"seed={seed}"
    # component-level equality (not just txid)
    d1, d2 = tx.data, tx2.data
    assert (d1.transparent_bundle is None) == (d2.transparent_bundle is None)
    if d1.transparent_bundle is not None:
        assert d1.transparent_bundle.vin == d2.transparent_bundle.vin
        assert d1.transparent_bundle.vout == d2.transparent_bundle.vout
    assert (d1.sapling_bundle is None) == (d2.sapling_bundle is None)
    if d1.sapling_bundle is not None:
        b1, b2 = d1.sapling_bundle, d2.sapling_bundle
        assert b1.shielded_spends == b2.shielded_spends, f"seed={seed}"
        assert b1.shielded_converts == b2.shielded_converts
        assert b1.shielded_outputs == b2.shielded_outputs
        assert b1.value_balance == b2.value_balance
        assert b1.authorization.binding_sig == b2.authorization.binding_sig


@pytest.mark.parametrize("seed", range(25, 40))
def test_arb_tx_auth_commitment_stable(seed):
    """auth_commitment covers witness data; identical bytes => identical
    digests, and proof mutation changes it (ZIP-244 analogue)."""
    tx = _arb_tx(seed)
    if tx.sapling_bundle is None or not tx.sapling_bundle.shielded_spends:
        pytest.skip("no spend witness to mutate")
    c1 = tx.auth_commitment()
    tx2 = Transaction.from_bytes(tx.to_bytes())
    assert tx2.auth_commitment() == c1
    # mutate one proof byte: txid stable, auth digest must change
    sp = tx.sapling_bundle.shielded_spends[0]
    sp.zkproof = bytes([sp.zkproof[0] ^ 1]) + sp.zkproof[1:]
    tx3 = tx.data.freeze()
    assert tx3.txid() == tx2.txid()
    assert tx3.auth_commitment() != c1


@pytest.mark.parametrize("seed", range(40, 55))
def test_arb_value_sum_roundtrip_and_laws(seed):
    g = _Rng(seed)
    assets = [g.asset() for _ in range(g.r.randrange(1, 5))]
    a = ValueSum.zero(I128)
    b = ValueSum.zero(I128)
    for at in assets:
        a = a + ValueSum.from_pair(at, g.r.randrange(-(1 << 40), 1 << 40))
        if g.r.random() < 0.7:
            b = b + ValueSum.from_pair(at, g.r.randrange(-(1 << 40), 1 << 40))
    # serialization round-trip
    from masp_tpu.transaction.borsh_io import value_sum_from_borsh, value_sum_to_borsh

    assert value_sum_from_borsh(value_sum_to_borsh(a)) == a
    # group laws (amount.rs semantics)
    assert a + b == b + a
    assert a - a == ValueSum.zero(I128)
    # inf/sup against a direct spec of the reference algorithm
    # (amount.rs:95-120 — rhs-keyed, zero entries elided; NOT a true
    # lattice over asymmetric supports, so no <= laws asserted here)
    def spec(lhs, rhs, pick):
        out = ValueSum.zero(I128)
        for at, rv in rhs.components():
            lv = lhs.get(at)
            chosen = pick(lv, rv)
            if chosen != 0:
                out = out + ValueSum.from_pair(at, chosen)
        return out

    assert a.inf(b) == spec(a, b, min)
    assert a.sup(b) == spec(a, b, max)
    # <= is the pointwise partial order when supports are compared directly
    if a.inf(b)._map.keys() <= a._map.keys():
        assert a.inf(b) <= a or a.inf(b).partial_cmp(a) is None

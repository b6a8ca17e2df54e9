"""Sapling primitives: keys, addresses, notes, nullifiers, RedJubjub.

Cross-checked against the reference's note-encryption test vectors
(masp_primitives/src/test_vectors/note_encryption.rs) for ivk->pk_d
derivation and cmu computation.
"""

import json
import pathlib

import pytest

from masp_tpu.curves.jubjub import ExtendedPoint
from masp_tpu.fields import JubjubFr
from masp_tpu.primitives import redjubjub
from masp_tpu.primitives.asset_type import AssetType
from masp_tpu.primitives.constants import spending_key_generator
from masp_tpu.primitives.keys import ExpandedSpendingKey, FullViewingKey
from masp_tpu.primitives.sapling import (
    Diversifier, Node, Note, PaymentAddress, Rseed, ValueCommitment, empty_roots,
    merkle_hash, spend_sig, uncommitted,
)
from masp_tpu.utils.rng import XorShiftRng

VECTORS = json.loads(
    (pathlib.Path(__file__).parent / "data" / "note_encryption_vectors.json").read_text()
)

TEST_ASSET = AssetType.from_identifier(b"testtesttesttesttesttesttesttest")


def test_test_asset_valid():
    assert TEST_ASSET is not None
    g = TEST_ASSET.asset_generator()
    assert not g.clear_cofactor().is_identity()


@pytest.mark.parametrize("idx", range(len(VECTORS)))
def test_note_cmu_vectors(idx):
    tv = VECTORS[idx]
    pk_d = ExtendedPoint.from_bytes(bytes.fromhex(tv["default_pk_d"]))
    assert pk_d is not None and pk_d.is_torsion_free()
    rcm = JubjubFr.from_bytes(bytes.fromhex(tv["rcm"]))
    assert rcm is not None
    d = Diversifier(bytes.fromhex(tv["default_d"]))
    to = PaymentAddress.from_parts(d, pk_d)
    assert to is not None
    note = to.create_note(TEST_ASSET, tv["v"], Rseed.before_zip212(rcm))
    assert note is not None
    assert note.cmu().to_bytes() == bytes.fromhex(tv["cmu"])


@pytest.mark.parametrize("idx", range(3))
def test_ivk_derives_pk_d(idx):
    tv = VECTORS[idx]
    from masp_tpu.primitives.sapling import SaplingIvk

    ivk = SaplingIvk(JubjubFr.from_bytes(bytes.fromhex(tv["ivk"])))
    d = Diversifier(bytes.fromhex(tv["default_d"]))
    addr = ivk.to_payment_address(d)
    assert addr is not None
    assert addr.pk_d.to_bytes() == bytes.fromhex(tv["default_pk_d"])


@pytest.mark.parametrize("idx", range(3))
def test_epk_from_esk(idx):
    tv = VECTORS[idx]
    esk = JubjubFr.from_bytes(bytes.fromhex(tv["esk"]))
    d = Diversifier(bytes.fromhex(tv["default_d"]))
    epk = d.g_d() * esk
    assert epk.to_bytes() == bytes.fromhex(tv["epk"])


def test_expanded_spending_key_and_address():
    expsk = ExpandedSpendingKey.from_spending_key(b"\x00" * 32)
    fvk = FullViewingKey.from_expanded_spending_key(expsk)
    pgk = expsk.proof_generation_key()
    assert pgk.to_viewing_key().ak == fvk.vk.ak
    assert pgk.to_viewing_key().nk == fvk.vk.nk
    # roundtrip
    assert ExpandedSpendingKey.from_bytes(expsk.to_bytes()).ask == expsk.ask
    assert FullViewingKey.from_bytes(fvk.to_bytes()).vk.ak == fvk.vk.ak
    # find a valid diversifier
    for i in range(256):
        d = Diversifier(bytes([i]) + b"\x00" * 10)
        addr = fvk.vk.to_payment_address(d)
        if addr is not None:
            break
    assert addr is not None
    assert PaymentAddress.from_bytes(addr.to_bytes()) == addr


def test_merkle_empty_roots():
    roots = empty_roots()
    assert len(roots) == 33
    assert roots[0] == Node(uncommitted().to_bytes())
    assert roots[1] == Node(merkle_hash(0, roots[0].repr, roots[0].repr))
    # depth-32 root is well-defined and in-field
    roots[32].to_scalar()


def test_value_commitment():
    vc = TEST_ASSET.value_commitment(100, JubjubFr(42))
    c = vc.commitment()
    # homomorphism: cv(a, r1) + cv(b, r2) == cv(a+b, r1+r2)
    vc2 = TEST_ASSET.value_commitment(23, JubjubFr(58))
    c2 = vc2.commitment()
    c3 = TEST_ASSET.value_commitment(123, JubjubFr(100)).commitment()
    assert c + c2 == c3


def test_redjubjub_sign_verify():
    rng = XorShiftRng.from_seed(bytes(range(16)))
    p_g = spending_key_generator()
    sk = redjubjub.PrivateKey(JubjubFr(123456789))
    vk = redjubjub.PublicKey.from_private(sk, p_g)
    msg = b"test message for redjubjub!!"
    sig = sk.sign(msg, rng, p_g)
    assert vk.verify(msg, sig, p_g)
    assert not vk.verify(b"other message", sig, p_g)
    # randomization
    alpha = JubjubFr(777)
    rsk = sk.randomize(alpha)
    rvk = vk.randomize(alpha, p_g)
    sig2 = rsk.sign(msg, rng, p_g)
    assert rvk.verify(msg, sig2, p_g)
    assert not vk.verify(msg, sig2, p_g)


def test_redjubjub_batch_verify():
    rng = XorShiftRng.from_seed(bytes(range(16, 32)))
    p_g = spending_key_generator()
    entries = []
    for i in range(5):
        sk = redjubjub.PrivateKey(JubjubFr(1000 + i))
        vk = redjubjub.PublicKey.from_private(sk, p_g)
        msg = bytes([i]) * 32
        sig = sk.sign(msg, rng, p_g)
        entries.append(redjubjub.BatchEntry(vk=vk, msg=msg, sig=sig))
    assert redjubjub.batch_verify(rng, entries, p_g)
    # corrupt one message
    entries[2] = redjubjub.BatchEntry(entries[2].vk, b"x" * 32, entries[2].sig)
    assert not redjubjub.batch_verify(rng, entries, p_g)


def test_spend_sig():
    rng = XorShiftRng.from_seed(bytes(range(32, 48)))
    p_g = spending_key_generator()
    ask = redjubjub.PrivateKey(JubjubFr(987654321))
    ar = JubjubFr(1357)
    sighash = b"\xab" * 32
    sig = spend_sig(ask, ar, sighash, rng)
    rk = redjubjub.PublicKey.from_private(ask.randomize(ar), p_g)
    assert rk.verify(rk.point.to_bytes() + sighash, sig, p_g)


def test_nullifier_changes_with_position():
    from masp_tpu.primitives.sapling import NullifierDerivingKey

    expsk = ExpandedSpendingKey.from_spending_key(b"\x01" * 32)
    fvk = FullViewingKey.from_expanded_spending_key(expsk)
    for i in range(256):
        d = Diversifier(bytes([i]) + b"\x01" * 10)
        addr = fvk.vk.to_payment_address(d)
        if addr is not None:
            break
    note = addr.create_note(TEST_ASSET, 10, Rseed.after_zip212(b"\x02" * 32))
    nf0 = note.nf(fvk.vk.nk, 0)
    nf1 = note.nf(fvk.vk.nk, 1)
    assert nf0 != nf1
    assert len(nf0.data) == 32

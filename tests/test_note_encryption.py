"""Note encryption against the reference's golden vectors
(masp_primitives/src/test_vectors/note_encryption.rs, via the same flow as
note_encryption.rs test_vectors())."""

import json
import pathlib

import pytest

from masp_tpu.curves.jubjub import ExtendedPoint
from masp_tpu.fields import JubjubFr, Scalar
from masp_tpu.note_encryption import (
    NoteEncryption, batch_try_compact_note_decryption, batch_try_note_decryption,
    try_compact_note_decryption, try_note_decryption,
    try_output_recovery_with_ock, try_output_recovery_with_ovk,
)
from masp_tpu.note_encryption.sapling_domain import (
    SaplingDomain, kdf_sapling, prf_ock, sapling_ka_agree,
)
from masp_tpu.primitives.asset_type import AssetType
from masp_tpu.primitives.consensus import TEST_NETWORK
from masp_tpu.primitives.keys import OutgoingViewingKey
from masp_tpu.primitives.memo import MemoBytes
from masp_tpu.primitives.sapling import Diversifier, PaymentAddress, Rseed, SaplingIvk
from masp_tpu.utils.rng import XorShiftRng

VECTORS = json.loads(
    (pathlib.Path(__file__).parent / "data" / "note_encryption_vectors.json").read_text()
)

ASSET = AssetType.from_identifier(b"testtesttesttesttesttesttesttest")
HEIGHT = 0  # pre-ZIP-212 on TEST_NETWORK


class FakeOutput:
    def __init__(self, epk_bytes, cmu_bytes, enc):
        self._epk = epk_bytes
        self._cmu = cmu_bytes
        self._enc = enc

    def ephemeral_key(self):
        return self._epk

    def cmstar_bytes(self):
        return self._cmu

    def enc_ciphertext(self):
        return self._enc


def _load(tv):
    b = lambda k: bytes.fromhex(tv[k])
    ivk = SaplingIvk(JubjubFr.from_bytes(b("ivk")))
    pk_d = ExtendedPoint.from_bytes(b("default_pk_d"))
    rcm = JubjubFr.from_bytes(b("rcm"))
    cv = ExtendedPoint.from_bytes(b("cv"))
    esk = JubjubFr.from_bytes(b("esk"))
    to = PaymentAddress.from_parts(Diversifier(b("default_d")), pk_d)
    note = to.create_note(ASSET, tv["v"], Rseed.before_zip212(rcm))
    return dict(tv=tv, b=b, ivk=ivk, pk_d=pk_d, cv=cv, esk=esk, to=to, note=note)


@pytest.mark.parametrize("idx", range(len(VECTORS)))
def test_vector_components(idx):
    fx = _load(VECTORS[idx])
    tv, b = fx["tv"], fx["b"]
    shared_secret = sapling_ka_agree(fx["esk"], fx["pk_d"])
    assert shared_secret.to_bytes() == b("shared_secret")
    k_enc = kdf_sapling(shared_secret, b("epk"))
    assert k_enc == b("k_enc")
    ovk = OutgoingViewingKey(b("ovk"))
    cmu = Scalar.from_bytes(b("cmu"))
    ock = prf_ock(ovk, fx["cv"], cmu.to_bytes(), b("epk"))
    assert ock == b("ock")
    assert fx["note"].cmu().to_bytes() == b("cmu")


@pytest.mark.parametrize("idx", range(len(VECTORS)))
def test_vector_decryption_paths(idx):
    fx = _load(VECTORS[idx])
    tv, b = fx["tv"], fx["b"]
    domain = SaplingDomain(TEST_NETWORK, HEIGHT)
    output = FakeOutput(b("epk"), b("cmu"), b("c_enc"))
    memo = b("memo")

    got = try_note_decryption(domain, fx["ivk"], output)
    assert got is not None, "note decryption failed"
    note, to, got_memo = got
    assert note == fx["note"]
    assert to == fx["to"]
    assert got_memo.as_array() == memo

    compact = FakeOutput(b("epk"), b("cmu"), b("c_enc")[:84])
    got_c = try_compact_note_decryption(domain, fx["ivk"], compact)
    assert got_c is not None, "compact decryption failed"
    assert got_c[0] == fx["note"]

    ovk = OutgoingViewingKey(b("ovk"))
    got_o = try_output_recovery_with_ovk(domain, ovk, output, fx["cv"], b("c_out"))
    assert got_o is not None, "output recovery failed"
    assert got_o[0] == fx["note"]

    got_ock = try_output_recovery_with_ock(domain, b("ock"), output, b("c_out"))
    assert got_ock is not None
    assert got_ock[0] == fx["note"]

    # batch paths
    [res] = batch_try_note_decryption([fx["ivk"]], [(domain, output)])
    assert res is not None and res[1] == 0 and res[0][0] == fx["note"]
    [res_c] = batch_try_compact_note_decryption([fx["ivk"]], [(domain, compact)])
    assert res_c is not None and res_c[0][0] == fx["note"]

    # wrong ivk finds nothing
    bad_ivk = SaplingIvk(JubjubFr(12345))
    assert try_note_decryption(domain, bad_ivk, output) is None


@pytest.mark.parametrize("idx", range(3))
def test_vector_encryption(idx):
    fx = _load(VECTORS[idx])
    tv, b = fx["tv"], fx["b"]
    domain = SaplingDomain(TEST_NETWORK, HEIGHT)
    ovk = OutgoingViewingKey(b("ovk"))
    ne = NoteEncryption.new_with_esk(
        domain, fx["esk"], ovk, fx["note"], fx["to"], MemoBytes(b("memo"))
    )
    assert domain.epk_bytes(ne.epk) == b("epk")
    enc = ne.encrypt_note_plaintext()
    assert enc == b("c_enc")
    cmu = Scalar.from_bytes(b("cmu"))
    rng = XorShiftRng.from_seed(bytes(16))
    out = ne.encrypt_outgoing_plaintext(fx["cv"], cmu, rng)
    assert out == b("c_out")

"""ZIP-32 cross-implementation vectors (reference zip32/sapling.rs:1372-2178,
sourced from zcash-test-vectors sapling_zip32.py with MASP personalizations),
extracted to tests/data/zip32_vectors.json by tools/extract_reference_vectors.py.

Pins master-seed -> extended-key derivation, FF1 diversifiers, internal
keys, and the 169-byte xsk/xfvk encodings — the ADVICE item: a silent
divergence here would produce incompatible keys/addresses."""

import json
import pathlib

from masp_tpu.primitives.sapling import Diversifier
from masp_tpu.primitives.zip32 import (
    ChildIndex, DiversifierIndex, ExtendedFullViewingKey, ExtendedSpendingKey,
    fvk_fingerprint, sapling_derive_internal_fvk,
)

VECTORS = json.loads(
    (pathlib.Path(__file__).parent / "data" / "zip32_vectors.json").read_text()
)

SEED = bytes(range(32))


def _keys():
    m = ExtendedSpendingKey.master(SEED)
    m_1 = m.derive_child(ChildIndex.non_hardened(1))
    m_1_2h = m_1.derive_child(ChildIndex.hardened(2))
    m_1_2hv = m_1_2h.to_extended_full_viewing_key()
    m_1_2hv_3 = m_1_2hv.derive_child(ChildIndex.non_hardened(3))
    xsks = [m, m_1, m_1_2h]
    xfvks = [
        m.to_extended_full_viewing_key(),
        m_1.to_extended_full_viewing_key(),
        m_1_2hv,
        m_1_2hv,
        m_1_2hv_3,
    ]
    return xsks, xfvks


def test_vector_count():
    assert len(VECTORS) == 5


def test_extended_spending_keys():
    xsks, _ = _keys()
    for xsk, tv in zip(xsks, VECTORS):
        assert xsk.expsk.ask.to_bytes().hex() == tv["ask"]
        assert xsk.expsk.nsk.to_bytes().hex() == tv["nsk"]
        assert xsk.expsk.ovk.data.hex() == tv["ovk"]
        assert xsk.dk.data.hex() == tv["dk"]
        assert xsk.chain_code.hex() == tv["c"]
        assert xsk.to_bytes().hex() == tv["xsk"]


def test_internal_spending_keys():
    xsks, _ = _keys()
    for xsk, tv in zip(xsks, VECTORS):
        internal = xsk.derive_internal()
        assert internal.expsk.ask.to_bytes().hex() == tv["ask"]
        assert internal.expsk.nsk.to_bytes().hex() == tv["internal_nsk"]
        assert internal.expsk.ovk.data.hex() == tv["internal_ovk"]
        assert internal.dk.data.hex() == tv["internal_dk"]
        assert internal.chain_code.hex() == tv["c"]
        assert internal.to_bytes().hex() == tv["internal_xsk"]


def test_extended_full_viewing_keys():
    _, xfvks = _keys()
    for xfvk, tv in zip(xfvks, VECTORS):
        assert xfvk.fvk.vk.ak.to_bytes().hex() == tv["ak"]
        assert xfvk.fvk.vk.nk.point.to_bytes().hex() == tv["nk"]
        assert xfvk.fvk.ovk.data.hex() == tv["ovk"]
        assert xfvk.dk.data.hex() == tv["dk"]
        assert xfvk.chain_code.hex() == tv["c"]
        assert xfvk.fvk.vk.ivk().fr.to_bytes().hex() == tv["ivk"]
        assert xfvk.to_bytes().hex() == tv["xfvk"]
        assert fvk_fingerprint(xfvk.fvk).hex() == tv["fp"]


def test_internal_full_viewing_keys():
    _, xfvks = _keys()
    for xfvk, tv in zip(xfvks, VECTORS):
        ifvk, idk = sapling_derive_internal_fvk(xfvk.fvk, xfvk.dk)
        assert ifvk.vk.nk.point.to_bytes().hex() == tv["internal_nk"]
        assert ifvk.ovk.data.hex() == tv["internal_ovk"]
        assert idk.data.hex() == tv["internal_dk"]
        assert ifvk.vk.ivk().fr.to_bytes().hex() == tv["internal_ivk"]
        internal_xfvk = ExtendedFullViewingKey(
            depth=xfvk.depth, parent_fvk_tag=xfvk.parent_fvk_tag,
            child_index=xfvk.child_index, chain_code=xfvk.chain_code,
            fvk=ifvk, dk=idk,
        )
        assert internal_xfvk.to_bytes().hex() == tv["internal_xfvk"]
        assert fvk_fingerprint(ifvk).hex() == tv["internal_fp"]


def test_diversifiers():
    _, xfvks = _keys()
    for xfvk, tv in zip(xfvks, VECTORS):
        for key, j in (("d0", 0), ("d1", 1), ("d2", 2)):
            d = xfvk.dk.diversifier(DiversifierIndex.from_u64(j))
            if tv[key] is None:
                assert d is None
            else:
                assert d.d.hex() == tv[key]
        dmax = xfvk.dk.diversifier(DiversifierIndex(b"\xff" * 11))
        if tv["dmax"] is None:
            assert dmax is None
        else:
            assert dmax.d.hex() == tv["dmax"]


def test_diversifier_index_roundtrip():
    _, xfvks = _keys()
    tv = VECTORS[0]
    dk = xfvks[0].dk
    d0 = Diversifier(bytes.fromhex(tv["d0"]))
    assert dk.diversifier_index(d0) == DiversifierIndex.from_u64(0)

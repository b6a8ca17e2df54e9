"""ZIP-339 against the official BIP-39 English wordlist and spec vectors.

The reference (masp_primitives/src/zip339.rs) re-exports the bip0039 crate,
whose English list is the canonical BIP-39 list; our copy is pinned by SHA-256
(masp_tpu/primitives/zip339.py) so these vectors prove interop.
"""

import pytest

from masp_tpu.primitives.zip339 import Mnemonic, MnemonicError, _load_wordlist


def test_official_wordlist_loads():
    words = _load_wordlist()
    assert len(words) == 2048
    assert words[0] == "abandon" and words[-1] == "zoo"
    assert words == sorted(words)
    # BIP-39 guarantees the first four letters identify a word uniquely
    assert len({w[:4] for w in words}) == 2048


# (entropy_hex, expected_mnemonic) from the BIP-39 reference vectors
VECTORS = [
    (
        "00000000000000000000000000000000",
        "abandon abandon abandon abandon abandon abandon abandon abandon "
        "abandon abandon abandon about",
    ),
    (
        "7f7f7f7f7f7f7f7f7f7f7f7f7f7f7f7f",
        "legal winner thank year wave sausage worth useful legal winner "
        "thank yellow",
    ),
    (
        "80808080808080808080808080808080",
        "letter advice cage absurd amount doctor acoustic avoid letter "
        "advice cage above",
    ),
    (
        "ffffffffffffffffffffffffffffffff",
        "zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo wrong",
    ),
    (
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff",
        "zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo "
        "zoo zoo zoo zoo zoo zoo zoo vote",
    ),
]


@pytest.mark.parametrize("entropy_hex,phrase", VECTORS)
def test_bip39_entropy_to_mnemonic(entropy_hex, phrase):
    m = Mnemonic.from_entropy(bytes.fromhex(entropy_hex))
    assert m.phrase == phrase
    # and the reverse direction recovers the entropy (checksum validated)
    assert Mnemonic(phrase).entropy == bytes.fromhex(entropy_hex)


def test_bip39_seed_vector():
    # First reference vector, passphrase "TREZOR"
    m = Mnemonic.from_entropy(bytes(16))
    assert m.to_seed("TREZOR").hex() == (
        "c55257c360c07c72029aebc1b53c05ed0362ada38ead3e3e9efa3708e534955"
        "31f09a6987599d18264c1e1c92f2cf141630c7a3c4ab7c81b2f001698e7463b04"
    )


def test_invalid_checksum_rejected():
    bad = (
        "abandon abandon abandon abandon abandon abandon abandon abandon "
        "abandon abandon abandon abandon"
    )
    with pytest.raises(MnemonicError):
        Mnemonic(bad)

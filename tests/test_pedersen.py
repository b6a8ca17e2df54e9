"""Pedersen hash vs the reference's 37 golden vectors
(masp_primitives/src/test_vectors/pedersen_hash_vectors.rs)."""

import json
import pathlib

import pytest

from masp_tpu.primitives.pedersen import Personalization, pedersen_hash

VECTORS = json.loads(
    (pathlib.Path(__file__).parent / "data" / "pedersen_hash_vectors.json").read_text()
)


@pytest.mark.parametrize("idx", range(len(VECTORS)))
def test_pedersen_vector(idx):
    v = VECTORS[idx]
    if v["personalization"] == "NoteCommitment":
        pers = Personalization.note_commitment()
    else:
        pers = Personalization.merkle_tree(v["num"])
    bits = [b == 1 for b in v["input_bits"]]
    assert pers.get_bits() == bits[:6]
    p = pedersen_hash(pers, bits[6:])
    u, vv = p.to_affine()
    assert u.n == int(v["hash_u"], 16)
    assert vv.n == int(v["hash_v"], 16)

"""Pin derived MASP generators against the reference's hardcoded coordinates
(masp_primitives/src/constants.rs:50-251), extracted to tests/data/generators.json."""

import json
import pathlib

import pytest

from masp_tpu.primitives import constants as C

DATA = pathlib.Path(__file__).parent / "data" / "generators.json"


@pytest.fixture(scope="module")
def golden():
    return json.loads(DATA.read_text())


@pytest.mark.parametrize(
    "name",
    [
        "proof_generation_key_generator",
        "note_commitment_randomness_generator",
        "nullifier_position_generator",
        "value_commitment_randomness_generator",
        "spending_key_generator",
    ],
)
def test_fixed_base_generators(golden, name):
    u, v = getattr(C, name)().to_affine()
    assert u.n == int(golden[name]["u"], 16)
    assert v.n == int(golden[name]["v"], 16)


def test_pedersen_generators(golden):
    for p, exp in zip(C.pedersen_hash_generators(), golden["pedersen_hash_generators"]):
        u, v = p.to_affine()
        assert u.n == int(exp["u"], 16)
        assert v.n == int(exp["v"], 16)


def test_no_duplicate_generators():
    gens = [
        C.proof_generation_key_generator(),
        C.note_commitment_randomness_generator(),
        C.nullifier_position_generator(),
        C.value_commitment_randomness_generator(),
        C.spending_key_generator(),
    ]
    for i, p1 in enumerate(gens):
        assert not p1.is_identity()
        for p2 in gens[i + 1:]:
            assert p1 != p2


def test_pedersen_generators_consistency():
    """No identity/duplicate/inverse/sum relations (constants.rs:402-450)."""
    gens = list(C.pedersen_hash_generators())
    for i, p1 in enumerate(gens):
        assert not p1.is_identity()
        for p2 in gens[i + 1:]:
            assert p1 != p2
            assert p1 != -p2
        for j, p2 in enumerate(gens):
            if j == i:
                continue
            for k, p3 in enumerate(gens):
                if k in (i, j):
                    continue
                assert p2 + p3 != p1

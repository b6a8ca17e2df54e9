"""Circuit gates: constraint counts, public-input layout, satisfiability,
negative witnesses — mirroring the reference's TestConstraintSystem strategy
(SURVEY.md §4)."""

import pytest

from masp_tpu.circuits.convert import Convert
from masp_tpu.circuits.sapling import Output, Spend
from masp_tpu.fields import JubjubFr, Scalar
from masp_tpu.primitives.asset_type import AssetType
from masp_tpu.primitives.keys import ExpandedSpendingKey
from masp_tpu.primitives.pedersen import Personalization, pedersen_hash
from masp_tpu.primitives.sapling import Diversifier, Note, Rseed, merkle_hash
from masp_tpu.r1cs.cs import TestConstraintSystem
from masp_tpu.r1cs.gadgets.multipack import bytes_to_bits_le, compute_multipacking
from masp_tpu.utils.rng import XorShiftRng, random_jubjub_fr

SEED = bytes([0x58, 0x62, 0xBE, 0x3D, 0x76, 0x3D, 0x31, 0x8D,
              0x17, 0xDB, 0x37, 0x32, 0x54, 0x06, 0xBC, 0xE5])


def _spend_fixture(rng):
    asset_type = AssetType.new(b"default")
    value_commitment = asset_type.value_commitment(
        rng.next_u64(), random_jubjub_fr(rng)
    )
    expsk = ExpandedSpendingKey.from_spending_key(b"\x42" * 32)
    pgk = expsk.proof_generation_key()
    vk = pgk.to_viewing_key()
    d = 0
    while True:
        div = Diversifier(d.to_bytes(11, "little"))
        addr = vk.to_payment_address(div)
        if addr is not None:
            break
        d += 1
    commitment_randomness = random_jubjub_fr(rng)
    ar = random_jubjub_fr(rng)
    auth_path = [
        (Scalar.from_bytes_wide(rng.fill_bytes(64)).n, rng.next_u32() % 2 != 0)
        for _ in range(32)
    ]
    note = Note(
        asset_type=asset_type,
        value=value_commitment.value,
        g_d=addr.g_d(),
        pk_d=addr.pk_d,
        rseed=Rseed.before_zip212(commitment_randomness),
    )
    cur = note.cmu().n
    position = 0
    for i, (sibling, is_right) in enumerate(auth_path):
        if is_right:
            position |= 1 << i
            lhs, rhs = sibling, cur
        else:
            lhs, rhs = cur, sibling
        cur = int.from_bytes(
            merkle_hash(i, lhs.to_bytes(32, "little"), rhs.to_bytes(32, "little")),
            "little",
        )
    return dict(
        value_commitment=value_commitment,
        proof_generation_key=pgk,
        viewing_key=vk,
        payment_address=addr,
        commitment_randomness=commitment_randomness,
        ar=ar,
        auth_path=auth_path,
        anchor=cur,
        note=note,
        position=position,
    )


def test_spend_constraint_count_shape():
    cs = TestConstraintSystem()
    Spend().synthesize(cs)
    assert cs.num_constraints == 100_637
    assert cs.num_inputs == 8  # 7 + ONE
    # full structure digest, bit-exact vs the reference pin
    # (masp_proofs/src/circuit/sapling.rs:733,:926)
    assert cs.hash() == (
        "34e4a634c80e4e4c6250e63b7855532e60b36d1371d4d7b1163218b69f09eb3d"
    )


def test_output_constraint_count_shape():
    cs = TestConstraintSystem()
    Output().synthesize(cs)
    assert cs.num_constraints == 31_205
    assert cs.num_inputs == 6  # 5 + ONE
    # reference pin: masp_proofs/src/circuit/sapling.rs:1026
    assert cs.hash() == (
        "93e445d7858e98c7138558df341f020aedfe75893535025587d64731e244276a"
    )


def test_convert_constraint_count_shape():
    cs = TestConstraintSystem()
    Convert().synthesize(cs)
    assert cs.num_constraints == 47_358
    assert cs.num_inputs == 4  # 3 + ONE
    # reference pin: masp_proofs/src/circuit/convert.rs:221
    assert cs.hash() == (
        "f74b47ef6e59081548f81f5806bd15b1f4a65d2e57681e6db2b8db7eef2ff814"
    )


@pytest.mark.slow
def test_spend_circuit_satisfied_and_layout():
    rng = XorShiftRng.from_seed(SEED)
    fx = _spend_fixture(rng)
    cs = TestConstraintSystem()
    Spend(
        value_commitment=fx["value_commitment"],
        proof_generation_key=fx["proof_generation_key"],
        payment_address=fx["payment_address"],
        commitment_randomness=fx["commitment_randomness"],
        ar=fx["ar"],
        auth_path=list(fx["auth_path"]),
        anchor=fx["anchor"],
    ).synthesize(cs)
    assert cs.is_satisfied(), cs.which_is_unsatisfied()
    assert cs.num_constraints == 100_637

    rku, rkv = fx["viewing_key"].rk(fx["ar"]).to_affine()
    cvu, cvv = fx["value_commitment"].commitment().to_affine()
    assert cs.get_input(0, "ONE") == 1
    assert cs.get_input(1, "rk/u/input variable") == rku.n
    assert cs.get_input(2, "rk/v/input variable") == rkv.n
    assert cs.get_input(3, "value commitment/commitment point/u/input variable") == cvu.n
    assert cs.get_input(4, "value commitment/commitment point/v/input variable") == cvv.n
    assert cs.get_input(5, "anchor/input variable") == fx["anchor"]
    nf = fx["note"].nf(fx["viewing_key"].nk, fx["position"])
    packed = compute_multipacking(bytes_to_bits_le(nf.data))
    assert cs.get_input(6, "pack nullifier/input 0") == packed[0]
    assert cs.get_input(7, "pack nullifier/input 1") == packed[1]

    # negative: corrupt one witness value -> exactly one constraint breaks
    good = cs.get("witness g_d/u/num")
    cs.set("witness g_d/u/num", good + 1)
    assert not cs.is_satisfied()
    cs.set("witness g_d/u/num", good)
    assert cs.is_satisfied()


@pytest.mark.slow
def test_output_circuit_satisfied_and_layout():
    rng = XorShiftRng.from_seed(SEED)
    asset_type = AssetType.new(b"default")
    value_commitment = asset_type.value_commitment(
        rng.next_u64(), random_jubjub_fr(rng)
    )
    expsk = ExpandedSpendingKey.from_spending_key(b"\x43" * 32)
    vk = expsk.proof_generation_key().to_viewing_key()
    d = 0
    while True:
        div = Diversifier(d.to_bytes(11, "little"))
        addr = vk.to_payment_address(div)
        if addr is not None:
            break
        d += 1
    commitment_randomness = random_jubjub_fr(rng)
    esk = random_jubjub_fr(rng)

    cs = TestConstraintSystem()
    Output(
        value_commitment=value_commitment,
        asset_identifier=[b == 1 for b in _id_bits(asset_type)],
        payment_address=addr,
        commitment_randomness=commitment_randomness,
        esk=esk,
    ).synthesize(cs)
    assert cs.is_satisfied(), cs.which_is_unsatisfied()
    assert cs.num_constraints == 31_205

    cvu, cvv = value_commitment.commitment().to_affine()
    epku, epkv = (addr.g_d() * esk).to_affine()
    note = Note(
        asset_type=asset_type,
        value=value_commitment.value,
        g_d=addr.g_d(),
        pk_d=addr.pk_d,
        rseed=Rseed.before_zip212(commitment_randomness),
    )
    assert cs.get_input(1, "value commitment/commitment point/u/input variable") == cvu.n
    assert cs.get_input(2, "value commitment/commitment point/v/input variable") == cvv.n
    assert cs.get_input(3, "epk/u/input variable") == epku.n
    assert cs.get_input(4, "epk/v/input variable") == epkv.n
    assert cs.get_input(5, "commitment/input variable") == note.cmu().n


@pytest.mark.slow
def test_convert_circuit_satisfied_and_layout():
    rng = XorShiftRng.from_seed(SEED)
    asset_type = AssetType.new(b"convert-me")
    value_commitment = asset_type.value_commitment(
        rng.next_u64(), random_jubjub_fr(rng)
    )
    # leaf = pedersen hash of the asset generator bits
    gen_bytes = asset_type.asset_generator().to_bytes()
    leaf_bits = [(b >> i) & 1 == 1 for b in gen_bytes for i in range(8)]
    leaf = pedersen_hash(Personalization.note_commitment(), leaf_bits)
    cur, _ = leaf.to_affine()
    cur = cur.n
    auth_path = [
        (Scalar.from_bytes_wide(rng.fill_bytes(64)).n, rng.next_u32() % 2 != 0)
        for _ in range(32)
    ]
    for i, (sibling, is_right) in enumerate(auth_path):
        lhs, rhs = (sibling, cur) if is_right else (cur, sibling)
        cur = int.from_bytes(
            merkle_hash(i, lhs.to_bytes(32, "little"), rhs.to_bytes(32, "little")),
            "little",
        )

    cs = TestConstraintSystem()
    Convert(
        value_commitment=value_commitment,
        auth_path=list(auth_path),
        anchor=cur,
    ).synthesize(cs)
    assert cs.is_satisfied(), cs.which_is_unsatisfied()
    assert cs.num_constraints == 47_358

    cvu, cvv = value_commitment.commitment().to_affine()
    assert cs.get_input(1, "value commitment/commitment point/u/input variable") == cvu.n
    assert cs.get_input(2, "value commitment/commitment point/v/input variable") == cvv.n
    assert cs.get_input(3, "anchor/input variable") == cur


def _id_bits(asset_type):
    return [1 if b else 0 for b in asset_type.identifier_bits()]

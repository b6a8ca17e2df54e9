"""Witness-tape recording/replay vs the Python gadget walk.

The tape is the replacement for bellperson's rayon-parallel synthesis
closures (reference masp_proofs/src/sapling/prover.rs creates each proof's
witness by re-running the circuit); here synthesis records once per circuit
class and replays per instance (masp_tpu/circuits/witness_tape.py)."""

import pytest

from masp_tpu.groth16.prover import synthesize_witness
from masp_tpu.r1cs.tape import TapeBranchError, TapeRecorder
from masp_tpu.utils.rng import XorShiftRng

import bench  # fixtures mirror the reference benches


def _fixture(kind, seed):
    rng = XorShiftRng.from_seed(bytes([seed]) * 16)
    make, _ = {
        "spend": bench._spend_fixture,
        "output": bench._output_fixture,
        "convert": bench._convert_fixture,
    }[kind](rng)
    return make


@pytest.mark.parametrize("kind", ["output", "convert"])
def test_tape_matches_python_witness(kind):
    make = _fixture(kind, 7)
    py = synthesize_witness(make(), use_tape=False)
    tp = synthesize_witness(make(), use_tape=True)
    assert type(tp).__name__ == "TapeWitness"
    assert tp.num_constraints == py.num_constraints
    assert tp.input_assignment == py.input_assignment
    assert tp.aux_assignment == py.aux_assignment


def test_tape_replay_fresh_instance():
    # replay a DIFFERENT instance than the one that recorded the tape
    make_a = _fixture("output", 7)
    make_b = _fixture("output", 11)
    synthesize_witness(make_a(), use_tape=True)  # records
    py = synthesize_witness(make_b(), use_tape=False)
    tp = synthesize_witness(make_b(), use_tape=True)
    assert tp.input_assignment == py.input_assignment
    assert tp.aux_assignment == py.aux_assignment


def test_tape_python_replay_matches_native():
    from masp_tpu import native
    from masp_tpu.circuits import witness_tape as WT
    from masp_tpu.r1cs.tape import _u64x4_to_ints

    if not native.tape_available():
        pytest.skip("native tape interpreter unavailable")
    make = _fixture("output", 7)
    inst = make()
    tape = WT.record_tape(inst)
    leaves = WT.leaves_for(inst)
    ins_py, aux_py = tape.replay_py([int(x) % tape_R for x in leaves])
    ins_u64, aux_u64 = tape.replay(leaves)
    assert _u64x4_to_ints(ins_u64) == ins_py
    assert _u64x4_to_ints(aux_u64) == aux_py


from masp_tpu.fields import SCALAR_MODULUS as tape_R  # noqa: E402


def test_tapeval_branch_guard():
    rec = TapeRecorder()
    v = rec.input(3)
    with pytest.raises(TapeBranchError):
        bool(v)
    with pytest.raises(TapeBranchError):
        v == 3  # noqa: B015
    x = (v + 2) * 5 - 1
    assert x.val == (3 + 2) * 5 - 1


@pytest.mark.parametrize("kind", ["output", "convert", "spend"])
def test_leveled_replay_matches_sequential(kind, monkeypatch):
    """The level-scheduled multithreaded replay is bit-identical to the
    sequential interpreter (same tape, same instance)."""
    from masp_tpu.circuits import witness_tape as WT

    make = _fixture(kind, 9)
    circ = make()
    tape = WT.record_tape(circ)
    leaves = WT.leaves_for(circ)

    monkeypatch.setenv("MASP_TAPE_LEVELED", "0")
    ins_seq, aux_seq = tape.replay(leaves)
    monkeypatch.setenv("MASP_TAPE_LEVELED", "1")
    ins_lvl, aux_lvl = tape.replay(leaves)
    assert (ins_seq == ins_lvl).all()
    assert (aux_seq == aux_lvl).all()

"""Exercise the reference-fixture cross-verification harness
(tools/cross_verify_fixtures.py) with a self-generated fixture.

Real reference fixtures (Rust-generated proofs) cannot be produced in this
environment; this test pins the harness's file formats and verdict logic so
that dropping genuine artifacts into a directory Just Works.
"""

import pathlib
import sys

import pytest

sys.path.insert(0, ".")

from tools.cross_verify_fixtures import cross_verify, load_inputs




@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """Generate the fixture ONCE per module: parameter generation compiles
    the tiny-shape MSM/NTT programs, which dominates the test wall-clock
    on a cold XLA cache."""
    return _write_fixture(tmp_path_factory.mktemp("fixtures"))


def _write_fixture(tmp_path: pathlib.Path):
    """Generate a tiny circuit's params + proof + inputs in fixture format."""
    from masp_tpu.groth16.generator import generate_random_parameters
    from masp_tpu.groth16.prover import create_proof_from_assembly, synthesize_witness
    from masp_tpu.r1cs.cs import TestConstraintSystem, lc_var
    from masp_tpu.utils.rng import XorShiftRng

    class MulCircuit:
        """x * y = z with z public."""

        def __init__(self, x=None, y=None):
            self.x = x
            self.y = y

        def synthesize(self, cs):
            from masp_tpu.r1cs.gadgets.num import AllocatedNum

            with cs.ns("x"):
                a = AllocatedNum.alloc(cs, self.x)
            with cs.ns("y"):
                b = AllocatedNum.alloc(cs, self.y)
            with cs.ns("product"):
                c = a.mul(cs, b)
            with cs.ns("out"):
                c.inputize(cs)

    rng = XorShiftRng.from_seed(bytes(range(16)))
    params = generate_random_parameters(MulCircuit(), rng)
    cs = synthesize_witness(MulCircuit(3, 5))
    proof = create_proof_from_assembly(cs, params, 11, 22)

    (tmp_path / "mul.params").write_bytes(params.write())
    (tmp_path / "mul.proof").write_bytes(proof.write())
    (tmp_path / "mul.inputs").write_bytes((15).to_bytes(32, "little"))
    return tmp_path


def test_cross_verify_roundtrip(fixture_dir):
    results = cross_verify(fixture_dir)
    assert results == [("mul", True)]


def test_cross_verify_rejects_wrong_inputs(fixture_dir):
    # runs after the roundtrip test; restore the good inputs afterwards
    good = (fixture_dir / "mul.inputs").read_bytes()
    try:
        (fixture_dir / "mul.inputs").write_bytes((16).to_bytes(32, "little"))
        results = cross_verify(fixture_dir)
        assert results == [("mul", False)]
    finally:
        (fixture_dir / "mul.inputs").write_bytes(good)


def test_load_inputs_rejects_noncanonical(tmp_path):
    from masp_tpu.fields import SCALAR_MODULUS

    p = tmp_path / "bad.inputs"
    p.write_bytes(SCALAR_MODULUS.to_bytes(32, "little"))
    with pytest.raises(ValueError):
        load_inputs(p)

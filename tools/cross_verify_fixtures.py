"""Cross-verify reference-generated Groth16 fixtures under our verifier.

Usage: python tools/cross_verify_fixtures.py [fixture_dir]

A fixture directory contains, per circuit, files produced by the Rust
reference stack (masp_proofs):

  <name>.params          bellman Parameters (or the phase2 MPC container —
                         trailing transcript bytes are ignored, exactly as
                         masp_proofs::parse_parameters does, lib.rs:330-347)
  <name>.proof           192-byte Groth16 proof (Proof::write)
  <name>.inputs          public inputs, 32-byte little-endian scalars,
                         concatenated (without the leading ONE)

For each triple we parse the parameters, prepare the verifying key, and run
our verifier; acceptance of reference-made proofs (and rejection after
flipping one input) is the bit-exactness oracle that replaces structure-
hash equality while nam-bellperson's hash algorithm remains unavailable
offline (see docs/PARITY.md "Known deltas").

Until reference artifacts can be produced in this environment (no egress,
params are LFS pointers), the harness is exercised by self-generated
fixtures: tests/test_cross_verify.py writes a fixture with our own prover
and runs this module against it.
"""

import io
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from masp_tpu.fields import SCALAR_MODULUS


def load_inputs(path: pathlib.Path) -> list[int]:
    data = path.read_bytes()
    if len(data) % 32:
        raise ValueError(f"{path}: length {len(data)} not a multiple of 32")
    out = [int.from_bytes(data[i : i + 32], "little") for i in range(0, len(data), 32)]
    bad = [x for x in out if x >= SCALAR_MODULUS]
    if bad:
        raise ValueError(f"{path}: non-canonical scalar(s)")
    return out


def cross_verify(fixture_dir) -> list[tuple[str, bool]]:
    """[(fixture name, ok)] for every <name>.proof in the directory."""
    from masp_tpu.groth16.structures import (
        Parameters, Proof, prepare_verifying_key,
    )
    from masp_tpu.groth16.verifier import verify_proof

    fixture_dir = pathlib.Path(fixture_dir)
    results = []
    for proof_path in sorted(fixture_dir.glob("*.proof")):
        name = proof_path.stem
        params_path = fixture_dir / f"{name}.params"
        inputs_path = fixture_dir / f"{name}.inputs"
        params = Parameters.read(io.BytesIO(params_path.read_bytes()), checked=False)
        pvk = prepare_verifying_key(params.vk)
        proof = Proof.read(proof_path.read_bytes())
        inputs = load_inputs(inputs_path)

        ok = verify_proof(pvk, proof, inputs)
        # a verifier that accepts everything proves nothing: flip an input
        flipped = list(inputs)
        flipped[0] = (flipped[0] + 1) % SCALAR_MODULUS
        ok = ok and not verify_proof(pvk, proof, flipped)
        results.append((name, ok))
    return results


def main():
    fixture_dir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "fixtures")
    if not fixture_dir.is_dir() or not list(fixture_dir.glob("*.proof")):
        print(f"no fixtures under {fixture_dir}/ — nothing to cross-verify "
              "(expected <name>.params/.proof/.inputs triples)")
        return 0
    results = cross_verify(fixture_dir)
    for name, ok in results:
        print(f"{name}: {'OK' if ok else 'FAILED'}")
    return 0 if all(ok for _, ok in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())

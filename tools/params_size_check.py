"""Predict the .params file size for each circuit from QAP densities and
compare to the byte sizes the reference pins (masp_proofs/src/lib.rs:74-76,
MASP_{SPEND,OUTPUT,CONVERT}_BYTES).

The production files are phase2 MPC transcripts wrapping a bellman
`Parameters` (the reference parses the Parameters prefix and drains the
rest into a sink while hashing, lib.rs:330-347):

  file = Parameters || cs_hash[64] || n_contribs u32 || n * PublicKey[544]

The Namada trusted-setup ceremony had 2511 contributions, so the trailing
transcript is a circuit-independent 64 + 4 + 2511*544 = 1,366,052 bytes.
The Parameters prefix is:

  vk(96*2 + 192*3 + 96 + 4 + 96*(n_inputs))  ic has n_inputs points
  + 4 + 96*h   h = fft_domain(constraints + input_constraints) - 1
  + 4 + 96*l   l = num_aux
  + 4 + 96*a   a = #vars with nonzero A density (inputs forced dense)
  + 4 + 96*b_g1 + 4 + 192*b_g2   b = #vars with nonzero B density

so exact size equality validates our constraint counts, input/aux split
AND the per-matrix densities — a strong offline content oracle.

Run: python tools/params_size_check.py
"""

import sys

sys.path.insert(0, ".")

from masp_tpu.groth16.params_io import (
    MASP_CONVERT_BYTES, MASP_OUTPUT_BYTES, MASP_SPEND_BYTES,
)

PINNED = {
    "spend": MASP_SPEND_BYTES,
    "output": MASP_OUTPUT_BYTES,
    "convert": MASP_CONVERT_BYTES,
}

# phase2 MPC transcript: cs_hash[64] + u32 count + 2511 contributions of
# 544 bytes (3 G1 uncompressed + 1 G2 uncompressed + 64-byte transcript
# digest each).
MPC_TRANSCRIPT_BYTES = 64 + 4 + 2511 * 544


def predict(which):
    """(predicted file size, breakdown dict) for one circuit."""
    from masp_tpu.groth16.generator import _add_input_constraints, _densities
    from masp_tpu.r1cs.cs import KeypairAssembly

    cs = KeypairAssembly()
    if which == "spend":
        from masp_tpu.circuits.sapling import Spend

        Spend().synthesize(cs)
    elif which == "output":
        from masp_tpu.circuits.sapling import Output

        Output().synthesize(cs)
    else:
        from masp_tpu.circuits.convert import Convert

        Convert().synthesize(cs)

    _add_input_constraints(cs)
    a_density, b_density = _densities(cs)
    n_constraints = cs.num_constraints
    n_inputs = cs.num_inputs
    n_aux = cs.num_aux

    domain = 1
    while domain < n_constraints:
        domain *= 2

    n_h = domain - 1
    n_l = n_aux
    n_a = int(a_density.sum())
    n_b = int(b_density.sum())

    vk = 96 * 2 + 192 * 3 + 96 + 4 + 96 * n_inputs
    size = (
        vk
        + 4 + 96 * n_h
        + 4 + 96 * n_l
        + 4 + 96 * n_a
        + 4 + 96 * n_b
        + 4 + 192 * n_b
        + MPC_TRANSCRIPT_BYTES
    )
    return size, dict(constraints=n_constraints, inputs=n_inputs, aux=n_aux,
                      domain=domain, h=n_h, l=n_l, a=n_a, b=n_b)


def main():
    ok = True
    for which in ("output", "convert", "spend"):
        size, info = predict(which)
        pinned = PINNED[which]
        status = "OK" if size == pinned else f"MISMATCH (delta {size - pinned:+d})"
        print(f"{which:8s} predicted {size:>10d}  pinned {pinned:>10d}  {status}")
        print(f"         {info}")
        ok &= size == pinned
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

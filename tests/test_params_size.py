"""Pin our circuits' QAP shape against the reference's production .params
file sizes (masp_proofs/src/lib.rs:74-76).

The production files are phase2 MPC transcripts wrapping a bellman
Parameters blob whose length is fully determined by the circuit: constraint
count, input/aux split, FFT domain, and the per-matrix A/B densities. Byte
equality with MASP_{SPEND,OUTPUT,CONVERT}_BYTES is therefore a strong
offline oracle on constraint-system content (see tools/params_size_check.py
for the layout breakdown).
"""

import sys

import pytest

sys.path.insert(0, ".")

from tools.params_size_check import PINNED, predict


@pytest.mark.parametrize("which", ["output", "convert", "spend"])
def test_predicted_params_size_matches_reference(which):
    size, info = predict(which)
    assert size == PINNED[which], info

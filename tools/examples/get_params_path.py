#!/usr/bin/env python
"""Print the default MASP parameters folder (mirrors
masp_proofs/examples/get-params-path.rs)."""
from masp_tpu.groth16.params_io import default_params_folder

if __name__ == "__main__":
    print(default_params_folder())

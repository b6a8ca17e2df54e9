#!/usr/bin/env python
"""Download MASP parameters (mirrors masp_proofs/examples/download-params.rs).
This environment has no egress; prints the instruction instead."""
from masp_tpu.groth16.params_io import download_masp_parameters

if __name__ == "__main__":
    try:
        download_masp_parameters()
    except Exception as e:
        print(e)

#!/usr/bin/env python
"""Re-serialize verifying keys from downloaded parameter files (mirrors
masp_proofs/examples/serialize-params.rs): writes masp-{spend,output,
convert}.vk next to the .params files."""
import sys

from masp_tpu.groth16.params_io import (
    MASP_CONVERT_NAME, MASP_OUTPUT_NAME, MASP_SPEND_NAME,
    default_params_folder, load_parameters,
)

if __name__ == "__main__":
    folder = default_params_folder()
    p = load_parameters(
        folder / MASP_SPEND_NAME, folder / MASP_OUTPUT_NAME, folder / MASP_CONVERT_NAME
    )
    for name, params in (
        ("masp-spend.vk", p.spend_params),
        ("masp-output.vk", p.output_params),
        ("masp-convert.vk", p.convert_params),
    ):
        (folder / name).write_bytes(params.vk.write())
        print("wrote", folder / name)

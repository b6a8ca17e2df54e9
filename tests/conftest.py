"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests validate against
XLA's host-platform virtual devices (SURVEY.md §5.8 / environment notes).

Note: this environment's sitecustomize pins JAX_PLATFORMS=axon (the real
TPU tunnel), so we must override via jax.config, not the env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

_TEST_TPU = os.environ.get("MASP_TEST_TPU") == "1"

if not _TEST_TPU:
    # Must happen BEFORE any masp_tpu import: importing field_jax touches
    # jax arrays, which locks the platform choice (to axon, per the
    # sitecustomize env pin) for the rest of the process.
    jax.config.update("jax_platforms", "cpu")

from masp_tpu.ops import field_jax as _F  # noqa: E402

if _TEST_TPU:
    # opt-in: run against the real TPU with the production pallas impl.
    # Use ONLY for the TPU-gated files, e.g.
    #   MASP_TEST_TPU=1 python -m pytest tests/test_kernels_tpu.py
    # (the full suite on TPU would pay pallas compiles per test file)
    _F.set_impl("pallas")
else:
    # CPU XLA chokes on the unrolled limb graphs; tests use the compact
    # (scan-based) implementation. TPU benches use "pallas"/"unrolled".
    _F.set_impl("compact")

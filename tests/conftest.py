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

_TEST_TPU = os.environ.get("MASP_TEST_TPU") == "1"

if not _TEST_TPU:
    # The persistent XLA cache's executable (de)serialization can hard-crash
    # on CPU in this remote-compile environment (observed SIGABRT on reads,
    # round 3, masp_tpu/__init__.py note; SIGSEGV inside
    # put_executable_and_time during the round-4 suite). Within one pytest
    # process the in-memory jit cache already dedups compiles, so the
    # persistent cache only saves cross-run time — not worth the crash
    # class. TPU runs keep it: those entries target the device, not the
    # host, and the big MSM programs are minutes to compile.
    os.environ.setdefault("MASP_TPU_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402

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

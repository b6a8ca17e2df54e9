"""masp_tpu: TPU-native MASP (multi-asset shielded pool) framework.

Layers (mirroring SURVEY.md):
  fields/curves   host-exact BLS12-381 + Jubjub (gold layer)
  ops             TPU limb kernels: fields, groups, MSM, NTT
  primitives      protocol: pedersen, keys, notes, redjubjub, assets
  r1cs/circuits   constraint system + Spend/Output/Convert
  groth16         parameter generation, proving, verification
  note_encryption, transaction   wallet/tx layers
"""

import os

# Persistent XLA compilation cache: the unrolled bignum graphs are expensive
# to compile but fully static, so cache hits make reruns instant.
#
# The cache is PARTITIONED by platform: CPU entries can be AOT-compiled on
# a different machine (remote-compile setups) and deserializing such an
# entry on a host with different CPU features can hard-abort the process
# (observed SIGABRT inside compilation_cache.get_executable_and_time), so
# CPU runs use their own directory while the accelerator cache — whose
# entries target the device, not the host — stays shared and warm.
if not os.environ.get("MASP_TPU_NO_COMPILE_CACHE"):
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            platforms = str(
                jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
            )
            # first listed platform wins (e.g. "axon,cpu" = axon with CPU
            # fallback -> accelerator cache)
            primary = platforms.split(",")[0].strip().lower()
            suffix = "_cpu" if primary == "cpu" else ""
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.expanduser(f"~/.cache/masp_tpu_xla{suffix}"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - jax always present in practice
        pass

__version__ = "0.1.0"

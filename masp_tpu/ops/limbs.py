"""Limb codecs: Python ints <-> uint32 limb arrays (16-bit limbs).

The TPU field kernels (masp_tpu.ops.field_jax) represent big integers as
arrays of 16-bit limbs stored in uint32 lanes: products of two limbs fit a
uint32 exactly, and column sums of up to ~2^6 such 16-bit pieces stay well
below 2^32 — the scheme that makes 255/381-bit modular arithmetic pure
int32-lane VPU work on TPU (SURVEY.md §7 hard part #2).
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, n_limbs: int) -> np.ndarray:
    out = np.empty(n_limbs, dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    assert x == 0, "value does not fit in limbs"
    return out


def limbs_to_int(limbs) -> int:
    x = 0
    arr = np.asarray(limbs, dtype=np.uint64)
    for i in range(arr.shape[-1] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(arr[..., i])
    return x


def ints_to_limbs(xs: list[int], n_limbs: int) -> np.ndarray:
    """Vectorized encode: [N] ints -> (N, n_limbs) uint32."""
    out = np.empty((len(xs), n_limbs), dtype=np.uint32)
    for j, x in enumerate(xs):
        for i in range(n_limbs):
            out[j, i] = x & LIMB_MASK
            x >>= LIMB_BITS
        assert x == 0
    return out


def limbs_to_ints(arr) -> list[int]:
    """(N, n_limbs) -> [N] ints."""
    a = np.asarray(arr)
    out = []
    for row in a.reshape(-1, a.shape[-1]):
        x = 0
        for limb in row[::-1]:
            x = (x << LIMB_BITS) | int(limb)
        out.append(x)
    return out


__all__ = ["LIMB_BITS", "LIMB_MASK", "int_to_limbs", "limbs_to_int",
           "ints_to_limbs", "limbs_to_ints"]

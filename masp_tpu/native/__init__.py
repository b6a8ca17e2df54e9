"""Native (C++) host-side helpers, loaded via ctypes.

The compute path proper is JAX/Pallas on TPU; these cover host loops the
reference implements natively (rayon/SIMD): R1CS row evaluation feeding the
prover. Built on demand with g++; falls back to pure Python when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SO = _DIR / "libmasp_native.so"
_LIB = None
_TRIED = False


def _build() -> bool:
    src = _DIR / "lc_eval.cpp"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_SO), str(src)],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SO.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_SO))
    lib.eval_lc_rows.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.u256_to_limbs16.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    _LIB = lib
    return lib


def _as_u64_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def eval_lc_rows_native(indptr: np.ndarray, var_idx: np.ndarray,
                        coeffs: np.ndarray, assignment: np.ndarray) -> np.ndarray:
    """CSR linear-combination evaluation mod r.

    indptr (rows+1) int64; var_idx (nnz) int64; coeffs (nnz, 4) u64 LE;
    assignment (vars, 4) u64 LE. Returns (rows, 4) u64 LE."""
    lib = get_lib()
    assert lib is not None
    num_rows = len(indptr) - 1
    out = np.empty((num_rows, 4), dtype=np.uint64)
    lib.eval_lc_rows(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        var_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _as_u64_ptr(coeffs),
        _as_u64_ptr(assignment),
        num_rows,
        _as_u64_ptr(out),
    )
    return out


def available() -> bool:
    return get_lib() is not None


__all__ = ["get_lib", "eval_lc_rows_native", "available"]

"""Radix-2 NTT evaluation domain over Fr, on TPU.

Replaces bellperson's EvaluationDomain fft/ifft/coset paths (SURVEY.md L5)
for the quotient polynomial h(x).  All transforms run on device as
log2(m) unrolled butterfly stages over Montgomery limb arrays; twiddle
tables are precomputed host-side per domain size and kept as constants.

Matches bellman's domain semantics: omega = ROOT_OF_UNITY^(2^(S - log2 m))
with the zkcrypto generator 7; coset shift = 7 (Fr multiplicative
generator); divide_by_z_on_coset multiplies by (g^m - 1)^{-1}.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from masp_tpu.fields import SCALAR_MODULUS
from masp_tpu.ops import field_jax as F
from masp_tpu.ops.field_jax import FR

R = SCALAR_MODULUS
GENERATOR = 7
TWO_ADICITY = 32
ROOT_OF_UNITY = pow(GENERATOR, (R - 1) >> TWO_ADICITY, R)


class Domain:
    """Size-m (power of two) evaluation domain with device-ready tables."""

    def __init__(self, m: int):
        assert m & (m - 1) == 0
        self.m = m
        self.log_m = m.bit_length() - 1
        self.omega = pow(ROOT_OF_UNITY, 1 << (TWO_ADICITY - self.log_m), R)
        self.omega_inv = pow(self.omega, -1, R)
        self.m_inv = pow(m, -1, R)
        self.g = GENERATOR
        self.g_inv = pow(GENERATOR, -1, R)
        # Z(g * omega^i) = g^m - 1 (constant on the coset)
        self.z_on_coset = (pow(self.g, m, R) - 1) % R
        self.z_on_coset_inv = pow(self.z_on_coset, -1, R)

    # --- host-side table construction (cached numpy, Montgomery limbs) ----
    @lru_cache(maxsize=None)
    def _twiddles(self, inverse: bool) -> list[np.ndarray]:
        """Per-stage twiddle tables for the iterative DIT butterfly:
        stage s (half = 2^s) uses w^(m/(2^(s+1)) * j) for j < 2^s."""
        w = self.omega_inv if inverse else self.omega
        out = []
        for s in range(self.log_m):
            half = 1 << s
            step = self.m // (2 * half)
            tw = [pow(w, step * j, R) for j in range(half)]
            out.append(F.encode(FR, tw))
        return out

    @lru_cache(maxsize=None)
    def _bitrev(self) -> np.ndarray:
        idx = np.arange(self.m)
        rev = np.zeros(self.m, dtype=np.int32)
        for i in range(self.m):
            r = 0
            x = i
            for _ in range(self.log_m):
                r = (r << 1) | (x & 1)
                x >>= 1
            rev[i] = r
        return rev

    @lru_cache(maxsize=None)
    def _powers(self, base: int) -> np.ndarray:
        """[base^i for i in range(m)] as Montgomery limbs."""
        out = []
        cur = 1
        for _ in range(self.m):
            out.append(cur)
            cur = cur * base % R
        return F.encode(FR, out)

    # --- device transforms ------------------------------------------------
    def _fft_core(self, x, inverse: bool):
        """x: (m, L) Montgomery limbs -> transformed, same layout."""
        x = x[jnp.asarray(self._bitrev())]
        for s in range(self.log_m):
            half = 1 << s
            tw = jnp.asarray(self._twiddles(inverse)[s])  # (half, L)
            xr = x.reshape(self.m // (2 * half), 2, half, FR.L)
            even = xr[:, 0]
            odd = F.mont_mul(FR, xr[:, 1], tw[None, :, :])
            lo = F.add(FR, even, odd)
            hi = F.sub(FR, even, odd)
            x = jnp.stack([lo, hi], axis=1).reshape(self.m, FR.L)
        return x

    def fft(self, x):
        return self._fft_core(x, inverse=False)

    def ifft(self, x):
        y = self._fft_core(x, inverse=True)
        minv = jnp.asarray(F.encode(FR, [self.m_inv])[0])
        return F.mont_mul(FR, y, minv[None, :])

    def coset_fft(self, x):
        """Evaluate on the coset g*H: scale coefficients by g^i, then fft."""
        gp = jnp.asarray(self._powers(self.g))
        return self.fft(F.mont_mul(FR, x, gp))

    def icoset_fft(self, x):
        """Inverse of coset_fft."""
        y = self.ifft(x)
        gip = jnp.asarray(self._powers(self.g_inv))
        return F.mont_mul(FR, y, gip)

    def divide_by_z_on_coset(self, x):
        zinv = jnp.asarray(F.encode(FR, [self.z_on_coset_inv])[0])
        return F.mont_mul(FR, x, zinv[None, :])


__all__ = ["Domain", "GENERATOR", "ROOT_OF_UNITY", "TWO_ADICITY"]

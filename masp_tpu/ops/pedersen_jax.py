"""Batched Pedersen hashing on device (Jubjub, signed-digit chunk tables).

Device counterpart of primitives/pedersen.py (reference:
masp_primitives/src/sapling/pedersen_hash.rs), used for bulk Merkle-tree
construction and batched note-commitment evaluation. TPU-native design —
NOT the host's sequential exp-table walk:

* Every 3-bit chunk j of generator segment s contributes
  d·2^(4j)·G_s with digit d = (1+a+2b)(1−2c) ∈ {±1..±4}. We precompute
  ONE table row of the 9 possible points per chunk position (d = −4..4,
  d = 0 the identity — used for padding), so a batch of N hashes is:
  numpy bit->digit extraction, one device gather of (C, N) table rows,
  and a log2(C)-level dyadic tree of batched complete Edwards adds
  (ops/jubjub_jax.JubjubOps — branch-free, identity-safe). No scalar
  accumulation, no windowed lookup chain.
* Total group adds per hash ≈ C (the chunk count, 172 for a Merkle
  node), every level a full-batch kernel — the same ladder shape the
  sorted MSM uses.

Exact vs the host pedersen_hash on every input (tests/test_pedersen_jax.py).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from masp_tpu.curves.jubjub import ExtendedPoint
from masp_tpu.fields import JubjubFr
from masp_tpu.ops import field_jax as F
from masp_tpu.ops import jubjub_jax as J
from masp_tpu.ops.field_jax import FR
from masp_tpu.primitives.constants import (
    PEDERSEN_HASH_CHUNKS_PER_GENERATOR,
    pedersen_hash_generators,
)
from masp_tpu.primitives.pedersen import Personalization

_Q = JubjubFr.META.modulus


@lru_cache(maxsize=None)
def _chunk_tables(n_chunks: int):
    """(C, 9, L) coord arrays: entry [c, d+4] = d · 2^(4·(c mod 63)) · G_(c//63)."""
    gens = pedersen_hash_generators()
    pts = []
    for c in range(n_chunks):
        seg, j = divmod(c, PEDERSEN_HASH_CHUNKS_PER_GENERATOR)
        base = gens[seg] * JubjubFr(pow(2, 4 * j, _Q))
        pts.extend(base * JubjubFr(d % _Q) for d in range(-4, 5))
    X, Y, Z = J.encode_points(pts)
    return tuple(
        jnp.asarray(a.reshape(n_chunks, 9, a.shape[-1])) for a in (X, Y, Z)
    )


def _digit_rows(personalization: Personalization, bits_rows: np.ndarray) -> np.ndarray:
    """(N, nbits) bool -> (N, C) int8 signed chunk digits (pedersen_hash.rs
    chunk encoding: d = (1 + a + 2b) · (1 − 2c); zero-padded tail bits)."""
    n = bits_rows.shape[0]
    pers = np.asarray(personalization.get_bits(), dtype=bool)
    full = np.concatenate(
        [np.broadcast_to(pers, (n, pers.shape[0])), bits_rows], axis=1
    )
    pad = (-full.shape[1]) % 3
    if pad:
        full = np.concatenate([full, np.zeros((n, pad), dtype=bool)], axis=1)
    a = full[:, 0::3].astype(np.int8)
    b = full[:, 1::3].astype(np.int8)
    c = full[:, 2::3].astype(np.int8)
    return (1 + a + 2 * b) * (1 - 2 * c)


@lru_cache(maxsize=None)
def _reduce_fn():
    """One compiled program: gather chunk points, fold over the chunk
    axis with a constant-shape fori_loop (a shape-halving tree would
    re-trace the add kernel per level; the serial fold does the same
    C·N add-elements with ONE body, all N hashes parallel per step)."""
    import jax

    @jax.jit
    def run(tX, tY, tZ, idx):
        cur = tuple(
            jnp.take_along_axis(t, idx[:, :, None], axis=1)
            for t in (tX, tY, tZ)
        )  # (C, N, L)
        n = idx.shape[1]
        ident = J.JubjubOps.IDENTITY_MONT
        acc0 = tuple(
            jnp.broadcast_to(jnp.asarray(i), (n, tX.shape[-1])) for i in ident
        )

        def body(i, acc):
            step = tuple(c[i] for c in cur)
            return J.JubjubOps.add_points(acc, step)

        return jax.lax.fori_loop(0, idx.shape[0], body, acc0)

    return run


def batch_pedersen_hash_points(personalization: Personalization,
                               bits_rows: np.ndarray):
    """N same-length hashes -> (X, Y, Z) device coord arrays, (N, L) each."""
    digits = _digit_rows(personalization, np.asarray(bits_rows, dtype=bool))
    _n, C = digits.shape
    tables = _chunk_tables(C)
    idx = jnp.asarray((digits.T + 4).astype(np.int32))  # (C, N)
    return _reduce_fn()(*tables, idx)


def batch_pedersen_hash(personalization: Personalization,
                        bits_list) -> list[ExtendedPoint]:
    """Batched <M_i> Pedersen hash; all inputs must share one bit length
    (the protocol's uses — Merkle nodes, note commitments — are fixed-
    width). Exact host-typed results."""
    rows = np.asarray([[bool(b) for b in bits] for bits in bits_list], dtype=bool)
    if rows.size == 0 and len(bits_list) == 0:
        return []
    return J.decode_points(*batch_pedersen_hash_points(personalization, rows))


def _le_bit_rows(items: list[bytes], nbits: int) -> np.ndarray:
    arr = np.frombuffer(b"".join(items), dtype=np.uint8).reshape(len(items), 32)
    bits = np.unpackbits(arr, axis=1, bitorder="little")
    return bits[:, :nbits].astype(bool)


def batch_merkle_hash(depth: int, pairs: list[tuple[bytes, bytes]]) -> list[bytes]:
    """N parent nodes of one tree level in one device program
    (primitives/sapling.py merkle_hash semantics: Pedersen over both
    255-bit children, parent = affine u, 32-byte LE)."""
    if not pairs:
        return []
    lhs = _le_bit_rows([l for l, _ in pairs], 255)
    rhs = _le_bit_rows([r for _, r in pairs], 255)
    rows = np.concatenate([lhs, rhs], axis=1)
    X, Y, Z = batch_pedersen_hash_points(Personalization.merkle_tree(depth), rows)
    u = F.mont_mul(FR, X, F.batch_mont_inv(FR, Z))
    return [v.to_bytes(32, "little") for v in F.decode(FR, np.asarray(u))]


__all__ = [
    "batch_pedersen_hash", "batch_pedersen_hash_points", "batch_merkle_hash",
]

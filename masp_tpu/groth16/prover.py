"""Groth16 prover: witness synthesis -> NTT quotient -> TPU MSMs -> proof.

Semantics match bellman ``create_random_proof`` (SURVEY.md §3.1): the same
input constraints, density-filtered queries, coset-NTT h(x) computation and
final proof assembly with randomizers r, s.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from masp_tpu.curves.bls12_381 import G1, G2, R
from masp_tpu.groth16.domain import Domain
from masp_tpu.groth16.generator import _add_input_constraints, _densities
from masp_tpu.groth16.structures import Parameters, Proof
from masp_tpu.ops import field_jax as F
from masp_tpu.ops import msm as M
from masp_tpu.ops import weierstrass_jax as W
from masp_tpu.ops.field_jax import FR
from masp_tpu.r1cs.cs import ProvingAssembly
from masp_tpu.utils.rng import random_scalar
from masp_tpu.utils.tracing import span

# window width: 8 on TPU (bucket phases are cheap there); 4 halves the
# serial bucket-reduction length for CPU test/dryrun runs (B=16 vs 256)
MSM_C = int(os.environ.get("MASP_MSM_C", "8"))
assert 2 <= MSM_C <= 16, "window width out of range"
# round-3 digit flow: scalars ship to the device as their native 16-bit
# limb rows and the MSM program extracts windows in-graph — the ~0.2 s
# of per-proof host digit marshalling disappears. Balanced signed digits
# (MASP_MSM_SIGNED=1) halve the bucket count but measured SLOWER on v5e
# (the per-window conditional negation re-touches all N gathered rows:
# 2^17 G1 signed c=8/10/11 = 188/169/184 ms vs 146 ms unsigned c=8), so
# unsigned extraction is the default. Only the sorted MSM implements
# device extraction; the legacy lanes impl and MSM_STACK keep host digits.
MSM_SIGNED = os.environ.get("MASP_MSM_SIGNED", "0") == "1"
MSM_FROM_LIMBS = os.environ.get("MASP_MSM_FROM_LIMBS", "1") == "1"
# lanes tuned empirically on v5e: 256 lanes cuts main-loop steps but the
# sequential lane-combine then dominates (Output got 30% slower); 64 is
# the round-1 sweet spot.
MSM_LANES_G1 = 64
MSM_LANES_G2 = 32
# "sorted" = sorted-prefix MSM (ops/msm_sorted.py, round-2 design);
# "lanes" = round-1 lane-private-bucket pippenger (ops/msm.py).
MSM_IMPL = os.environ.get("MASP_MSM", "sorted")
# stack the four G1 queries into one vmapped MSM program: measured 6x
# SLOWER on v5e (vmapped per-window gather lowers poorly) — keep the
# separate async dispatches; flag retained for re-evaluation
MSM_STACK = os.environ.get("MASP_MSM_STACK", "0") == "1"
MSM_FROM_LIMBS = MSM_FROM_LIMBS and MSM_IMPL == "sorted" and not MSM_STACK
MSM_SIGNED = MSM_SIGNED and MSM_FROM_LIMBS
# round-3 boolean split: most l/a/b exponents are bit-decomposition wires
# whose values the R1CS forces into {0,1} (Spend: the blake2s and Merkle
# gadgets). A {0,1}-scalar multi-exp needs ONE window instead of
# ceil(255/c)=32, so each query is split statically into a bits part and
# a full-width part (prepare_split_queries; masks from _boolean_var_mask)
MSM_SPLIT = os.environ.get("MASP_MSM_SPLIT", "1") == "1"
MSM_SPLIT = MSM_SPLIT and MSM_IMPL == "sorted" and not MSM_STACK
# below this many bit wires the split isn't worth the extra dispatches:
# each split adds ~2 relay round-trips (~30 ms each) while the saving
# scales with the query size. Measured: Spend (50-68k bit wires/query)
# gains ~0.4 s/proof; Output/Convert (17-24k) LOSE ~0.13 s/proof with a
# 4096 threshold. 32768 separates them cleanly.
MSM_SPLIT_MIN = int(os.environ.get("MASP_MSM_SPLIT_MIN", "32768"))
# round-3 fused prove program: the whole device stream — h quotient
# pipeline, on-device h scalar prep, and every MSM (split or not) with
# the split halves combined in-graph — as ONE jitted program, ONE
# dispatch, ONE fetch of 5 points. Motivation: ~25-80 ms of overhead
# per dispatch through the axon relay. MEASURED SLOWER than the async
# per-query dispatches on v5e (Spend 9-iter medians 1.40 vs 1.32 s):
# the one-program form serializes all input transfers before execution,
# while back-to-back dispatches overlap query k+1's transfer with query
# k's compute. Kept as an opt-in for transports with cheaper transfers.
MSM_FUSED = os.environ.get("MASP_MSM_FUSED", "0") == "1"
MSM_FUSED = MSM_FUSED and MSM_FROM_LIMBS
# round-4 on-device LC evaluation: the per-constraint a/b/c values are a
# CSR spmv over the witness (gather + mont_mul by per-term constants +
# segment-sum), fused into the h-pipeline program. Replaces the native
# host LC eval (~60 ms/proof for Spend) and the 3x(m, L) limb transfer
# (~12.6 MB) with ONE (n_vars, L) witness transfer (~5.8 MB).
ABC_DEVICE = os.environ.get("MASP_ABC_DEVICE", "1") == "1"
# round-4 BGMW fixed-base tables for the h query: Groth16 proving MSMs run
# over FIXED parameter points, so [2^(c*w)]P_i slabs are precomputed once
# per params load (ONE device program: c doublings per slab + a batched
# affinization) and the 32-window c=8 Pippenger collapses to single-window
# merged MSMs at c=12 (22 windows -> [16,4,2] power-of-two groups):
# ~1.45x fewer tree adds, no Horner doublings, smaller gathers. Costs
# ~(W-1)x the h rows in HBM (~800 MB at 2^17).
MSM_BGMW_H = os.environ.get("MASP_MSM_BGMW_H", "0") == "1"
MSM_BGMW_C = int(os.environ.get("MASP_MSM_BGMW_C", "12"))
MSM_BGMW_H = MSM_BGMW_H and MSM_IMPL == "sorted" and MSM_FROM_LIMBS


def _eval_lc_rows(rows, inputs, aux):
    out = []
    for row in rows:
        acc = 0
        for v, c in row:
            val = inputs[v // 2] if v % 2 == 0 else aux[v // 2]
            acc += c * val
        out.append(acc % R)
    return out


def _ints_to_u64x4(vals):
    buf = b"".join(int(v).to_bytes(32, "little") for v in vals)
    return np.frombuffer(buf, dtype=np.uint64).reshape(len(vals), 4).copy()


def _u64x4_to_limbs16(arr):
    """(N, 4) u64 -> (N, 16) uint32 16-bit limbs.

    On little-endian hosts the u64 words ARE the 16-bit limbs in memory
    order, so this is a reinterpret + widen (measured 128 ms -> ~6 ms for
    a Spend's 3n rows vs the shift-and-mask loop)."""
    import sys

    n = arr.shape[0]
    if sys.byteorder == "little":
        return np.ascontiguousarray(arr).view(np.uint16).reshape(n, 16).astype(np.uint32)
    out = np.empty((n, 16), dtype=np.uint32)
    for j in range(16):
        out[:, j] = ((arr[:, j // 4] >> np.uint64(16 * (j % 4))) & np.uint64(0xFFFF)).astype(
            np.uint32
        )
    return out


def _csr_for(cs):
    """CSR structure of the concatenated a|b|c rows; cached per circuit shape
    (the structure is deterministic for a fixed circuit)."""
    key = ("csr", cs.num_constraints, cs.num_inputs, cs.num_aux)
    csr = _JIT_CACHE.get(key)
    if csr is not None:
        return csr
    n_inputs = cs.num_inputs
    indptr = [0]
    var_idx = []
    coeffs = []
    for rows in (cs.a_rows, cs.b_rows, cs.c_rows):
        for row in rows:
            for v, c in row:
                var_idx.append((v // 2) if v % 2 == 0 else n_inputs + v // 2)
                coeffs.append(c)
            indptr.append(len(var_idx))
    csr = (
        np.asarray(indptr, dtype=np.int64),
        np.asarray(var_idx, dtype=np.int64),
        _ints_to_u64x4(coeffs),
    )
    _JIT_CACHE[key] = csr
    return csr


def _assignment_u64(cs) -> np.ndarray:
    """Full assignment (inputs then aux) as (n, 4) u64 LE."""
    if hasattr(cs, "inputs_u64"):  # TapeWitness: already arrays
        return np.concatenate([cs.inputs_u64, cs.aux_u64], axis=0)
    return _ints_to_u64x4(cs.input_assignment + cs.aux_assignment)


def _digits_from_u64(arr: np.ndarray, n_padded: int) -> np.ndarray:
    """(n, 4) u64 LE scalars -> (n_padded, 256/c) int32 c-bit digits."""
    n = arr.shape[0]
    b = np.ascontiguousarray(arr).view(np.uint8).reshape(n, 32)
    if MSM_C == 8:
        out = np.zeros((n_padded, 32), dtype=np.int32)
        out[:n] = b
        return out
    assert MSM_C == 4, "host digit extraction supports c=4 or c=8"
    out = np.zeros((n_padded, 64), dtype=np.int32)
    out[:n, 0::2] = b & 0xF
    out[:n, 1::2] = b >> 4
    return out


def _u64x4_to_u16(arr: np.ndarray) -> np.ndarray:
    """(n, 4) u64 -> (n, 16) uint16 limb rows, a zero-copy reinterpret on
    little-endian hosts. Scalars ship at HALF the bytes of the u32
    layout; device programs widen in-graph (host->device transfer
    through the relay is a measurable per-proof cost)."""
    import sys

    n = arr.shape[0]
    if sys.byteorder == "little":
        return np.ascontiguousarray(arr).view(np.uint16).reshape(n, 16)
    return _u64x4_to_limbs16(arr).astype(np.uint16)


def _limbs_from_u64(arr: np.ndarray, n_padded: int) -> np.ndarray:
    """(n, 4) u64 LE scalars -> (n_padded, 16) uint16 limb rows for
    on-device digit extraction (msm_sorted.windows_from_limbs) — a
    reinterpret, no per-digit host work, half-width transfer."""
    n = arr.shape[0]
    out = np.zeros((n_padded, 16), dtype=np.uint16)
    out[:n] = _u64x4_to_u16(arr)
    return out


def _scalar_input(arr: np.ndarray, n_padded: int) -> np.ndarray:
    """Scalar-side MSM input in the active layout: limb rows (signed
    device extraction) or host-extracted digits."""
    if MSM_FROM_LIMBS:
        return _limbs_from_u64(arr, n_padded)
    return _digits_from_u64(arr, n_padded)


def _h_digits_device(h_bytes):
    """(n, 32) device byte digits -> (n, 256/c) c-bit digits (device)."""
    if MSM_C == 8:
        return h_bytes
    lo = h_bytes & 0xF
    hi = h_bytes >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(h_bytes.shape[0], 64)


def _h_scalar_input(h_coeffs, m: int, n_g1: int):
    """Scalar-side MSM input for the h query, staying on device.

    Signed/limbs layout: Montgomery -> canonical limb rows (the MSM
    program extracts windows in-graph). Legacy layout: byte digits."""
    if MSM_FROM_LIMBS:
        h_limbs = F.from_mont(FR, h_coeffs[: m - 1])  # (m-1, L) canonical
        out = jnp.zeros((n_g1, FR.L), dtype=h_limbs.dtype)
        return out.at[: m - 1].set(h_limbs)
    h_digits_full = _h_digits_device(M.fr_digits_device(h_coeffs[: m - 1]))
    out = jnp.zeros((n_g1, h_digits_full.shape[1]), dtype=jnp.int32)
    return out.at[: m - 1].set(h_digits_full)


def _global_var(v: int, n_inputs: int) -> int:
    """Encoded CS variable -> index into the full (inputs ++ aux)
    assignment, matching _csr_for/_densities ordering."""
    return (v // 2) if v % 2 == 0 else n_inputs + v // 2


def _boolean_var_mask(cs) -> np.ndarray:
    """(n_vars,) bool mask of variables the R1CS structure FORCES into
    {0, 1} for any satisfying assignment. Seeds: the exact bellman
    boolean-constraint shape (1 - v)*(v) = 0 (r1cs/gadgets/boolean.py:29).
    Closure: gadget shapes whose output is a bit whenever their inputs
    are bits — xor (2a)*(b) = (a + b - v), and (a)*(b) = (v),
    and-not (a)*(1 - b) = (v), nor (1 - a)*(1 - b) = (v) — iterated to a
    fixpoint. Used to split MSM queries: a {0,1}-scalar multi-exp needs
    ONE window instead of ceil(255/c) (see prepare_split_queries)."""
    n_inputs = cs.num_inputs
    n_vars = n_inputs + cs.num_aux
    mask = np.zeros(n_vars, dtype=bool)
    R1 = R - 1

    def g(v):
        return _global_var(v, n_inputs)

    def _bit_factor(row):
        """(v) or (ONE - v) or (ONE): returns the dependency list if the
        factor is a bit whenever its vars are bits, else None."""
        d = dict(row)
        if len(d) == 1:
            (v, co), = d.items()
            if co != 1:
                return None
            return [] if v == 0 else [g(v)]
        if len(d) == 2 and d.get(0) == 1:
            others = [v for v in d if v != 0]
            if d[others[0]] == R1:
                return [g(others[0])]
        return None

    seeds = []
    rules = []  # (out_gvar, [dep_gvars])
    for a_row, b_row, c_row in zip(cs.a_rows, cs.b_rows, cs.c_rows):
        da, db, dc = dict(a_row), dict(b_row), dict(c_row)
        # seed: (ONE - v) * (v) = 0
        if (
            not dc
            and len(db) == 1
            and len(da) == 2
            and da.get(0) == 1
        ):
            bv, bc = b_row[0]
            if bc == 1 and bv != 0 and da.get(bv) == R1:
                seeds.append(g(bv))
                continue
        # xor: (2a) * (b) = (a + b - v); v = a ^ b is a bit for bits a, b
        if len(db) == 1 and len(da) == 1 and len(dc) == 3:
            bv, bc = next(iter(db.items()))
            av, ac = next(iter(da.items()))
            if bc == 1 and ac == 2 and dc.get(av) == 1 and dc.get(bv) == 1:
                rest = [v for v in dc if v not in (av, bv)]
                if len(rest) == 1 and dc[rest[0]] == R1 and rest[0] != 0:
                    rules.append((g(rest[0]), [g(av), g(bv)]))
                    continue
        # product forms with bit factors: and / and-not / nor / copy
        if len(dc) == 1:
            cv, cc = next(iter(dc.items()))
            if cc == 1 and cv != 0:
                fa = _bit_factor(a_row)
                fb = _bit_factor(b_row)
                if fa is not None and fb is not None:
                    rules.append((g(cv), fa + fb))

    for s in seeds:
        mask[s] = True
    # worklist propagation to the fixpoint
    dep_rules: dict[int, list[int]] = {}
    for ridx, (_out, deps) in enumerate(rules):
        for d in deps:
            dep_rules.setdefault(d, []).append(ridx)
    pending = [d for d in range(len(rules)) if not rules[d][1]]
    pending += [r for s in seeds for r in dep_rules.get(s, [])]
    while pending:
        ridx = pending.pop()
        out, deps = rules[ridx]
        if mask[out] or not all(mask[d] for d in deps):
            continue
        mask[out] = True
        pending.extend(dep_rules.get(out, []))
    mask[0] = False  # ONE rides the verifier-side IC, never split
    return mask


def _boolean_mask_cached(cs) -> np.ndarray:
    key = ("boolmask", cs.num_constraints, cs.num_inputs, cs.num_aux)
    m = _JIT_CACHE.get(key)
    if m is None:
        m = _boolean_var_mask(cs)
        _JIT_CACHE[key] = m
    return m


def _densities_cached(cs):
    dkey = ("density", cs.num_constraints, cs.num_inputs, cs.num_aux)
    dens = _JIT_CACHE.get(dkey)
    if dens is None:
        dens = _densities(cs)
        _JIT_CACHE[dkey] = dens
    return dens


def _identity_row(g2: bool) -> np.ndarray:
    pts = [G2.identity()] if g2 else [G1.identity()]
    enc = W.encode_g2_points(pts) if g2 else W.encode_g1_points(pts)
    return np.concatenate([np.asarray(c).reshape(1, -1) for c in enc], axis=1)


def prepare_split_queries(params: Parameters, cs) -> None:
    """Split the l/a/b_g1/b_g2 queries into a {0,1}-scalar part and a
    full-width part, per the circuit's structural boolean mask.

    The bits part costs one window (N tree adds) instead of 32; for
    Spend ~3/4 of the exponents are bit wires, cutting those MSMs ~70%.
    Splits are static per circuit (masks from the R1CS shape), so the
    point rows are split and device-cached once. Witness values are
    re-checked against the mask at prove time (raise on violation)."""
    if not MSM_SPLIT or params.device.get("mesh") is not None:
        return
    skey = ("split", cs.num_constraints, cs.num_inputs, cs.num_aux)
    if params.device.get("split_key") == skey:
        return
    mask = _boolean_mask_cached(cs)
    host_rows = params.device.pop("_host_rows", None)
    if host_rows is None:
        cache_path = getattr(params, "rows_cache", None)
        if cache_path and os.path.exists(cache_path):
            with np.load(cache_path) as z:
                host_rows = {k: z[k] for k in ("l", "a", "b_g1", "b_g2")}
    if host_rows is None or not mask.any():
        params.device["split_key"] = skey
        return
    a_density, b_density = _densities_cached(cs)
    n_inputs = cs.num_inputs
    qmasks = {
        "l": mask[n_inputs:],
        "a": mask[a_density],
        "b_g1": mask[b_density],
        "b_g2": mask[b_density],
    }
    n_reals = {
        "l": len(params.l), "a": len(params.a),
        "b_g1": len(params.b_g1), "b_g2": len(params.b_g2),
    }
    for name, qm in qmasks.items():
        n_real = n_reals[name]
        assert qm.shape[0] == n_real, (name, qm.shape, n_real)
        n_small = int(qm.sum())
        if n_small < MSM_SPLIT_MIN or n_small == n_real:
            continue
        rows = np.asarray(host_rows[name][:n_real])
        ident = _identity_row(name == "b_g2")

        def pad_pow2(r):
            npad = 1 << max(3, (r.shape[0] - 1).bit_length())
            out = np.tile(ident, (npad, 1))
            out[: r.shape[0]] = r
            return out

        params.device[f"{name}_small"] = jax.device_put(pad_pow2(rows[qm]))
        params.device[f"{name}_full"] = jax.device_put(pad_pow2(rows[~qm]))
        params.device[f"{name}_qmask"] = qm
    params.device["split_key"] = skey


def _msm_bits_async(points_dev, bits, g2: bool):
    """MSM over {0,1} scalars: a masked sum (select identity where the
    bit is 0 + one halving ladder) — N-1 adds, no sort/gather/buckets."""
    from masp_tpu.ops import msm_sorted as MS

    fops = W.G2Ops if g2 else W.G1Ops
    key = ("msm_bits", g2, points_dev.shape[0])
    fn = _JIT_CACHE.get(key)
    if fn is None:
        def run(pk, d):
            return MS.masked_sum(fops, pk, d)

        fn = jax.jit(run)
        _JIT_CACHE[key] = fn
    return fn(points_dev, bits)


def _msm_query_async(params: Parameters, name: str, arr_u64, mesh=None):
    """Enqueue one proving query's MSM(s); returns a list of device
    handles whose fetched sum is the query result (1 handle unsplit,
    2 when the boolean split is active for this query)."""
    dev = params.device
    g2 = name == "b_g2"
    one_async = _msm_g2_async if g2 else _msm_g1_async
    if mesh is not None or f"{name}_small" not in dev:
        pts = dev[name]
        return [one_async(pts, _scalar_input(arr_u64, _dev_n(pts)), mesh=mesh)]
    qm = dev[f"{name}_qmask"]
    small = arr_u64[qm]
    full = arr_u64[~qm]
    if small.size and (small[:, 1:].any() or (small[:, 0] > 1).any()):
        raise AssertionError(
            f"boolean-split mask violated by witness for query {name!r}"
        )
    n_sp = _dev_n(dev[f"{name}_small"])
    bits = np.zeros((n_sp, 1), dtype=np.int8)
    bits[: small.shape[0], 0] = small[:, 0].astype(np.int8)
    hs = _msm_bits_async(dev[f"{name}_small"], jnp.asarray(bits), g2)
    hf = one_async(
        dev[f"{name}_full"], _scalar_input(full, _dev_n(dev[f"{name}_full"]))
    )
    return [hs, hf]


def _fetch_query_g1(handles):
    pts = [_fetch_g1(h) for h in handles]
    acc = pts[0]
    for p in pts[1:]:
        acc = acc + p
    return acc


def _fetch_query_g2(handles):
    pts = [_fetch_g2(h) for h in handles]
    acc = pts[0]
    for p in pts[1:]:
        acc = acc + p
    return acc


def _fused_scalar_io(params: Parameters, aux_u64, a_u64, b_u64):
    """Host side of the fused program: the (points, scalars) pytrees for
    every query, split halves included. Raises if a witness value
    violates the structural boolean mask."""
    dev = params.device
    points, scalars = {"h": dev["h"]}, {}
    for q, arr in (
        ("l", aux_u64), ("a", a_u64), ("b_g1", b_u64), ("b_g2", b_u64)
    ):
        if f"{q}_small" in dev:
            qm = dev[f"{q}_qmask"]
            small = arr[qm]
            full = arr[~qm]
            if small.size and (small[:, 1:].any() or (small[:, 0] > 1).any()):
                raise AssertionError(
                    f"boolean-split mask violated by witness for query {q!r}"
                )
            n_sp = _dev_n(dev[f"{q}_small"])
            bits = np.zeros((n_sp, 1), dtype=np.int8)
            bits[: small.shape[0], 0] = small[:, 0].astype(np.int8)
            points[f"{q}_small"] = dev[f"{q}_small"]
            points[f"{q}_full"] = dev[f"{q}_full"]
            scalars[f"{q}_bits"] = bits
            scalars[f"{q}_full"] = _scalar_input(full, _dev_n(dev[f"{q}_full"]))
        else:
            points[q] = dev[q]
            scalars[q] = _scalar_input(arr, _dev_n(dev[q]))
    return points, scalars


def _fused_prove_async(params: Parameters, m: int, az, bz, cz,
                       aux_u64, a_u64, b_u64):
    """The ENTIRE proving device stream as one jitted program: h quotient
    pipeline + on-device h scalar prep + all five MSM queries (split
    halves combined in-graph). One dispatch, one fetch of 5 points —
    the ~25-80 ms per-dispatch relay overhead is paid once instead of
    ~10 times (measured in tools/profile_prover.py)."""
    from masp_tpu.ops import msm_sorted as MS

    dev = params.device
    points, scalars = _fused_scalar_io(params, aux_u64, a_u64, b_u64)
    dom = Domain(m)
    n_g1 = _dev_n(dev["h"])
    split = tuple(q for q in ("l", "a", "b_g1", "b_g2") if f"{q}_small" in dev)

    key = ("fused", m, n_g1, split)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        def one_msm(fops, pts, scal):
            return MS.sorted_msm_from_limbs(
                fops, pts, scal, MSM_C, signed=MSM_SIGNED
            )

        def run(points, scalars, az, bz, cz):
            h_coeffs = _h_pipeline_graph(dom, az, bz, cz)
            h_limbs = F.from_mont(FR, h_coeffs[: m - 1])
            h_in = jnp.zeros((n_g1, FR.L), dtype=h_limbs.dtype)
            h_in = h_in.at[: m - 1].set(h_limbs)
            out = {"h": one_msm(W.G1Ops, points["h"], h_in)}
            for q in ("l", "a", "b_g1", "b_g2"):
                fops = W.G2Ops if q == "b_g2" else W.G1Ops
                if f"{q}_small" in points:
                    p1 = MS.masked_sum(
                        fops, points[f"{q}_small"], scalars[f"{q}_bits"]
                    )
                    p2 = one_msm(fops, points[f"{q}_full"], scalars[f"{q}_full"])
                    comb = W.g_add(
                        fops,
                        tuple(x[None] for x in p1),
                        tuple(x[None] for x in p2),
                    )
                    out[q] = tuple(x[0] for x in comb)
                else:
                    out[q] = one_msm(fops, points[q], scalars[q])
            return out

        fn = jax.jit(run)
        _JIT_CACHE[key] = fn
    return fn(points, scalars, az, bz, cz)


def _compute_abc_limbs(cs, m):
    """Canonical (non-Montgomery) 16-bit-limb arrays (m, L) of the
    per-constraint a/b/c evaluations; native C++ path when available."""
    from masp_tpu import native

    n = cs.num_constraints
    if native.available():
        indptr, var_idx, coeffs = _csr_for(cs)
        assignment = _assignment_u64(cs)
        vals = native.eval_lc_rows_native(indptr, var_idx, coeffs, assignment)
        limbs = _u64x4_to_u16(vals)  # (3n, 16), half-width transfer
        out = []
        for k in range(3):
            part = np.zeros((m, FR.L), dtype=np.uint16)
            part[:n] = limbs[k * n : (k + 1) * n]
            out.append(jnp.asarray(part))
        return out
    a_vals = _eval_lc_rows(cs.a_rows, cs.input_assignment, cs.aux_assignment)
    b_vals = _eval_lc_rows(cs.b_rows, cs.input_assignment, cs.aux_assignment)
    c_vals = _eval_lc_rows(cs.c_rows, cs.input_assignment, cs.aux_assignment)
    pad = m - n
    return [
        jnp.asarray(F.encode(FR, vals + [0] * pad, mont=False).astype(np.uint16))
        for vals in (a_vals, b_vals, c_vals)
    ]


def _csr_device_cached(cs, m: int):
    """Device-resident CSR of the a|b|c rows for the on-device LC
    evaluation: gather indices into the full assignment, padded segment
    ids, and per-term coefficients stored as mont(c) 16-bit limb rows
    (mont_mul(mont(c), v_canonical) = c*v canonical). Coefficients dedup
    through np.unique — circuits use a handful of distinct constants
    (1, -1, powers of two from packing), so the host bigint work is tiny."""
    key = ("csr_dev", cs.num_constraints, cs.num_inputs, cs.num_aux)
    ent = _JIT_CACHE.get(key)
    if ent is not None:
        return ent
    indptr, var_idx, coeffs_u64 = _csr_for(cs)
    n = cs.num_constraints
    rows = np.repeat(np.arange(3 * n, dtype=np.int64), np.diff(indptr))
    seg = ((rows // n) * m + (rows % n)).astype(np.int32)
    uniq, inv = np.unique(coeffs_u64, axis=0, return_inverse=True)
    mont_rows = np.zeros((uniq.shape[0], FR.L), dtype=np.uint16)
    for i in range(uniq.shape[0]):
        c = int.from_bytes(uniq[i].tobytes(), "little")
        cm = c * FR.R % R
        for j in range(FR.L):
            mont_rows[i, j] = (cm >> (16 * j)) & 0xFFFF
    ent = (
        jax.device_put(jnp.asarray(var_idx.astype(np.int32))),
        jax.device_put(jnp.asarray(seg)),
        jax.device_put(jnp.asarray(mont_rows[inv])),
    )
    _JIT_CACHE[key] = ent
    return ent


def _abc_h_graph(dom: Domain, m: int, var_idx, seg, coeff16, v16):
    """On-device LC evaluation fused with the h pipeline: full witness
    limb rows in (ONE transfer per proof), Montgomery h coefficients out.

    Per-constraint value = segment-sum of mont(c)*v products (canonical,
    < r each). The lazy u32 limb sums carry-normalize to S0 (16 limbs) +
    an overflow limb s16 < max row length; since 2^256 = R_fr, the
    Montgomery form of the total is to_mont(S0) + to_mont(to_mont(s16))."""
    v = v16.astype(jnp.uint32)
    g = jnp.take(v, var_idx, axis=0)
    prods = F.mont_mul(FR, coeff16.astype(jnp.uint32), g)
    S = jax.ops.segment_sum(prods, seg, num_segments=3 * m)
    out0 = []
    carry = jnp.zeros_like(S[:, 0])
    for i in range(FR.L):
        vcol = S[:, i] + carry
        out0.append(vcol & 0xFFFF)
        carry = vcol >> 16
    S0 = jnp.stack(out0, axis=1)
    s16rows = jnp.zeros_like(S0).at[:, 0].set(carry)
    vals_m = F.add(
        FR, F.to_mont(FR, S0), F.to_mont(FR, F.to_mont(FR, s16rows))
    )
    return _h_pipeline_graph(
        dom, vals_m[:m], vals_m[m : 2 * m], vals_m[2 * m :],
        inputs_mont=True,
    )


def _compute_h_device(dom: Domain, cs, m: int, v16: np.ndarray):
    """h(x) coefficients straight from the witness: device CSR spmv +
    NTT quotient pipeline as ONE program (replaces the native host LC
    eval + the 3x(m, L) limb transfer with a single witness transfer)."""
    var_idx, seg, coeff16 = _csr_device_cached(cs, m)
    key = ("abc_h", m, var_idx.shape[0])
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            lambda vi, sg, cf, v: _abc_h_graph(dom, m, vi, sg, cf, v)
        )
        _JIT_CACHE[key] = fn
    return fn(var_idx, seg, coeff16, jnp.asarray(v16))


def _compute_h_coeffs(dom: Domain, a_vals, b_vals, c_vals, mesh=None):
    """Device: h(x) coefficients from per-constraint evaluations.

    a_vals/b_vals/c_vals: (m, L) CANONICAL limb arrays (zero-padded);
    Montgomery conversion happens on device. With a mesh, every NTT's
    element axis is sharded over the mesh's "msm" axis
    (parallel/mesh.py sharded_h_pipeline)."""
    if mesh is not None:
        from masp_tpu.parallel import mesh as PM

        key = ("h_pipeline_mesh", dom.m, tuple(sorted(mesh.shape.items())))
        fn = _JIT_CACHE.get(key)
        if fn is None:
            def run(a, b, c):
                return PM.sharded_h_pipeline(mesh, dom, a, b, c, axis="msm")

            fn = jax.jit(run)
            _JIT_CACHE[key] = fn
        return fn(a_vals, b_vals, c_vals)

    key = ("h_pipeline", dom.m)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda a, b, c: _h_pipeline_graph(dom, a, b, c))
        _JIT_CACHE[key] = fn
    return fn(a_vals, b_vals, c_vals)


def _h_pipeline_graph(dom: Domain, a, b, c, inputs_mont: bool = False):
    """Traceable h(x) pipeline body (canonical limbs in, Montgomery h
    coefficients out); shared by the standalone and fused programs.
    Accepts uint16 limb rows (half-width transfer) and widens here.
    ``inputs_mont``: values already in Montgomery form (the on-device
    LC-eval path), skip the conversion."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    c = c.astype(jnp.uint32)
    if not inputs_mont:
        a = F.to_mont(FR, a)
        b = F.to_mont(FR, b)
        c = F.to_mont(FR, c)
    a = dom.coset_fft(dom.ifft(a))
    b = dom.coset_fft(dom.ifft(b))
    c = dom.coset_fft(dom.ifft(c))
    t = F.sub(FR, F.mont_mul(FR, a, b), c)
    t = dom.divide_by_z_on_coset(t)
    return dom.icoset_fft(t)


_JIT_CACHE: dict = {}


def _mesh_key(mesh):
    return None if mesh is None else tuple(sorted(mesh.shape.items()))


def _msm_g1_async(points_dev, digits, mesh=None):
    """Enqueue a G1 MSM; returns device arrays (no host sync).

    points_dev: packed (N, 72) rows (sorted impl) or (X, Y, Z) coord
    arrays (lanes impl), padded to the shared per-params size. With a
    mesh, the point axis is sharded over its "msm" axis."""
    if mesh is not None:
        from masp_tpu.parallel import mesh as PM

        key = ("msm_g1_mesh", points_dev.shape[0], _mesh_key(mesh),
               MSM_FROM_LIMBS, MSM_SIGNED)
        fn = _JIT_CACHE.get(key)
        if fn is None:
            def run(packed, d):
                return PM.sharded_sorted_msm(
                    mesh, W.G1Ops, packed, d, MSM_C, axis="msm",
                    from_limbs=MSM_FROM_LIMBS, signed=MSM_SIGNED,
                )

            fn = jax.jit(run)
            _JIT_CACHE[key] = fn
        return fn(points_dev, digits)
    if MSM_IMPL == "sorted":
        from masp_tpu.ops import msm_sorted as MS

        key = ("msm_g1_sorted", points_dev.shape[0], MSM_FROM_LIMBS, MSM_SIGNED)
        fn = _JIT_CACHE.get(key)
        if fn is None:
            if MSM_FROM_LIMBS:
                def run(packed, d):
                    return MS.sorted_msm_from_limbs(
                        W.G1Ops, packed, d, MSM_C, signed=MSM_SIGNED
                    )
            else:
                def run(packed, d):
                    return MS.sorted_msm(W.G1Ops, packed, d, MSM_C)

            fn = jax.jit(run)
            _JIT_CACHE[key] = fn
        return fn(points_dev, digits)
    key = ("msm_g1", points_dev[0].shape[0])
    fn = _JIT_CACHE.get(key)
    if fn is None:
        def run(px, py, pz, d):
            return M.pippenger_msm(W.G1Ops, (px, py, pz), d, c=MSM_C, lanes=MSM_LANES_G1)

        fn = jax.jit(run)
        _JIT_CACHE[key] = fn
    return fn(*points_dev, digits)


def _msm_g2_async(points_dev, digits, mesh=None):
    if mesh is not None:
        from masp_tpu.parallel import mesh as PM

        key = ("msm_g2_mesh", points_dev.shape[0], _mesh_key(mesh),
               MSM_FROM_LIMBS, MSM_SIGNED)
        fn = _JIT_CACHE.get(key)
        if fn is None:
            def run(packed, d):
                return PM.sharded_sorted_msm(
                    mesh, W.G2Ops, packed, d, MSM_C, axis="msm",
                    from_limbs=MSM_FROM_LIMBS, signed=MSM_SIGNED,
                )

            fn = jax.jit(run)
            _JIT_CACHE[key] = fn
        return fn(points_dev, digits)
    if MSM_IMPL == "sorted":
        from masp_tpu.ops import msm_sorted as MS

        key = ("msm_g2_sorted", points_dev.shape[0], MSM_FROM_LIMBS, MSM_SIGNED)
        fn = _JIT_CACHE.get(key)
        if fn is None:
            if MSM_FROM_LIMBS:
                def run(packed, d):
                    return MS.sorted_msm_from_limbs(
                        W.G2Ops, packed, d, MSM_C, signed=MSM_SIGNED
                    )
            else:
                def run(packed, d):
                    return MS.sorted_msm(W.G2Ops, packed, d, MSM_C)

            fn = jax.jit(run)
            _JIT_CACHE[key] = fn
        return fn(points_dev, digits)
    key = ("msm_g2", points_dev[0].shape[0])
    fn = _JIT_CACHE.get(key)
    if fn is None:
        def run(px, py, pz, d):
            return M.pippenger_msm(W.G2Ops, (px, py, pz), d, c=MSM_C, lanes=MSM_LANES_G2)

        fn = jax.jit(run)
        _JIT_CACHE[key] = fn
    return fn(*points_dev, digits)


def _prepare_bgmw_h(params: Parameters) -> None:
    """Build (once, on device) the BGMW table for the h query."""
    if "h_bgmw" in params.device or "h" not in params.device:
        return
    from masp_tpu.ops import msm_sorted as MS

    key = ("bgmw_build", params.device["h"].shape[0], MSM_BGMW_C)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            lambda pk: MS.build_bgmw_table(W.G1Ops, pk, MSM_BGMW_C)
        )
        _JIT_CACHE[key] = fn
    params.device["h_bgmw"] = fn(params.device["h"])


def _msm_h_bgmw_async(table_dev, h_limbs):
    from masp_tpu.ops import msm_sorted as MS

    key = ("msm_h_bgmw", table_dev.shape[0])
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            lambda t, s: MS.bgmw_msm_from_limbs(W.G1Ops, t, s, MSM_BGMW_C)
        )
        _JIT_CACHE[key] = fn
    return fn(table_dev, h_limbs)


def _msm_g1_batch_async(points_stack, digits_stack):
    """Q same-size G1 MSMs in one vmapped program (no host sync).

    points_stack: (Q, N, 72) packed rows; digits_stack: (Q, N, 32)."""
    from masp_tpu.ops import msm_sorted as MS

    key = ("msm_g1_sorted_batch", points_stack.shape[0], points_stack.shape[1])
    fn = _JIT_CACHE.get(key)
    if fn is None:
        def run(pk, d):
            return MS.sorted_msm_batch(W.G1Ops, pk, d, MSM_C)

        fn = jax.jit(run)
        _JIT_CACHE[key] = fn
    return fn(points_stack, digits_stack)


def _fetch_g1_batch(out):
    from masp_tpu.ops.weierstrass_jax import decode_g1_points

    return decode_g1_points(*(np.asarray(x) for x in out))


def _fetch_g1(out):
    from masp_tpu.ops.weierstrass_jax import decode_g1_points

    return decode_g1_points(*(np.asarray(x)[None] for x in out))[0]


def _fetch_g2(out):
    from masp_tpu.ops.weierstrass_jax import decode_g2_points

    return decode_g2_points(*(np.asarray(x)[None] for x in out))[0]


def _msm_g1(points_dev, digits, n):
    return _fetch_g1(_msm_g1_async(points_dev, digits))


def _msm_g2(points_dev, digits):
    return _fetch_g2(_msm_g2_async(points_dev, digits))


def _pad_to(n, mult):
    return n + ((-n) % mult)


def _encode_g1_padded(points, lanes):
    n = _pad_to(len(points), lanes)
    pts = list(points) + [G1.identity()] * (n - len(points))
    return tuple(jnp.asarray(x) for x in W.encode_g1_points(pts))


def _encode_g2_padded(points, lanes):
    n = _pad_to(len(points), lanes)
    pts = list(points) + [G2.identity()] * (n - len(points))
    return tuple(jnp.asarray(x) for x in W.encode_g2_points(pts))


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _dev_n(points_dev) -> int:
    """Padded point count of a device query in either MSM layout."""
    return points_dev.shape[0] if MSM_IMPL == "sorted" else points_dev[0].shape[0]


def prepare_device_params(params: Parameters, mesh=None) -> None:
    """Encode all proving queries once onto the device (cached in
    params.device). All G1 queries pad to ONE shared size so a single
    compiled MSM program serves h/l/a/b_g1 (power of two for the sorted
    MSM's prefix ladder; packed [X|Y|Z] rows so the per-window reorder is
    one row-gather per point). With a mesh, rows are placed sharded over
    its "msm" axis so the sharded MSM reads local shards."""
    if params.device.get("mesh") != _mesh_key(mesh) and "h" in params.device:
        params.device.clear()
    if "h" in params.device:
        return
    params.device["mesh"] = _mesh_key(mesh)

    def put(rows):
        if mesh is None:
            return jax.device_put(rows)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(rows, NamedSharding(mesh, P("msm")))

    n_max = max(len(params.h), len(params.l), len(params.a), len(params.b_g1))
    if MSM_IMPL == "sorted" or mesh is not None:
        n_shared = _next_pow2(n_max)
        params.device["n_g1"] = n_shared
        # Production sizes: pad each query to its OWN power of two — the
        # density-filtered b_g1 query is typically half the h/l pad (Spend:
        # 62,170 points -> 2^16 vs the shared 2^17), so the sorted MSM does
        # half the prefix-ladder work. Costs one extra compiled program per
        # distinct size (persisted in the XLA cache). Small test/dryrun
        # params keep the single shared program to bound CPU trace count.
        per_query = n_shared >= (1 << 14) and not (mesh is None and MSM_STACK)

        def _pack(coords, n):
            return np.concatenate([np.asarray(c).reshape(n, -1) for c in coords], axis=1)

        def _build_rows():
            out = {}
            for name, pts in (("h", params.h), ("l", params.l), ("a", params.a), ("b_g1", params.b_g1)):
                n_pad = _next_pow2(len(pts)) if per_query else n_shared
                if mesh is not None:
                    n_pad = max(n_pad, mesh.shape["msm"])
                pts = list(pts) + [G1.identity()] * (n_pad - len(pts))
                out[name] = _pack(W.encode_g1_points(pts), n_pad)
            n2_pad = _next_pow2(len(params.b_g2))
            if mesh is not None:
                n2_pad = max(n2_pad, mesh.shape["msm"])
            pts2 = list(params.b_g2) + [G2.identity()] * (n2_pad - len(params.b_g2))
            out["b_g2"] = _pack(W.encode_g2_points(pts2), n2_pad)
            return out

        # host-side rows cache: encoding ~0.5M points from Python ints to
        # limb rows is tens of seconds of per-process host work — cache the
        # packed arrays next to the params file (params_io sets rows_cache)
        cache_path = getattr(params, "rows_cache", None)
        use_cache = cache_path is not None and mesh is None and not MSM_STACK
        host_rows = None
        if use_cache and os.path.exists(cache_path):
            with np.load(cache_path) as z:
                host_rows = {k: z[k] for k in ("h", "l", "a", "b_g1", "b_g2")}
        if host_rows is None:
            host_rows = _build_rows()
            if use_cache:
                tmp = f"{cache_path}.tmp-{os.getpid()}"
                np.savez(tmp, **host_rows)  # savez appends .npz to tmp
                os.replace(tmp + ".npz", cache_path)

        if mesh is None and MSM_STACK:
            # one (4, N, 72) stack: the four G1 MSMs as a single vmapped
            # program (measured slower on v5e — see MSM_STACK above)
            params.device["g1_stack"] = jax.device_put(
                np.stack([host_rows[k] for k in ("h", "l", "a", "b_g1")])
            )
            params.device["g1_index"] = {"h": 0, "l": 1, "a": 2, "b_g1": 3}
        else:
            for name in ("h", "l", "a", "b_g1"):
                params.device[name] = put(host_rows[name])
        params.device["b_g2"] = put(host_rows["b_g2"])
        if MSM_SPLIT and mesh is None:
            # keep the raw rows around until prepare_split_queries slices
            # them (it pops this; reloadable from rows_cache otherwise)
            params.device["_host_rows"] = {
                k: host_rows[k] for k in ("l", "a", "b_g1", "b_g2")
            }
        if MSM_BGMW_H and mesh is None and not MSM_STACK:
            _prepare_bgmw_h(params)
        return
    params.device["n_g1"] = _pad_to(n_max, MSM_LANES_G1)
    n_pad = params.device["n_g1"]
    for name, pts in (("h", params.h), ("l", params.l), ("a", params.a), ("b_g1", params.b_g1)):
        pts = list(pts) + [G1.identity()] * (n_pad - len(pts))
        params.device[name] = tuple(jnp.asarray(x) for x in W.encode_g1_points(pts))
    params.device["b_g2"] = _encode_g2_padded(params.b_g2, MSM_LANES_G2)


def synthesize_witness(circuit, use_tape: bool | None = None):
    """Produce the full R1CS assignment for a circuit instance.

    Fast path (default when available): replay the circuit's recorded
    witness tape in C++ (masp_tpu/circuits/witness_tape.py) — the
    equivalent of bellperson's native parallel synthesis. Falls back to the
    Python gadget walk (also used for structure and as the recording
    substrate)."""
    import os

    if use_tape is None:
        use_tape = os.environ.get("MASP_WITNESS_TAPE", "1") == "1"
    if use_tape:
        from masp_tpu import native
        from masp_tpu.circuits import witness_tape as WT

        if (
            native.tape_available()
            and WT.supported(circuit)
            and WT.has_full_instance(circuit)
        ):
            with span("witness/tape"):
                return WT.fast_witness(circuit)
    with span("witness/python"):
        cs = ProvingAssembly()
        circuit.synthesize(cs)
        _add_input_constraints(cs)
        return cs


def create_proof(circuit, params: Parameters, r: int, s: int) -> Proof:
    cs = synthesize_witness(circuit)
    return create_proof_from_assembly(cs, params, r, s)


def create_proof_from_assembly(
    cs, params: Parameters, r: int, s: int, mesh=None
) -> Proof:
    """Groth16 prove. With a mesh (jax.sharding.Mesh with an "msm" axis),
    the five MSMs run point-sharded and every NTT element-sharded across
    the axis — the TPU-pod replacement for bellperson's in-node rayon
    parallelism (SURVEY.md §2.4/§5.8)."""
    prepare_device_params(params, mesh=mesh)
    prepare_split_queries(params, cs)

    m = 1 << (cs.num_constraints - 1).bit_length()
    dom = Domain(m)

    fused = (
        MSM_FUSED and mesh is None and MSM_IMPL == "sorted"
        and "g1_stack" not in params.device
    )
    use_dev_abc = ABC_DEVICE and mesh is None and not fused
    full_u64 = None
    if use_dev_abc:
        with span("witness_marshal"):
            full_u64 = _assignment_u64(cs)
            v16 = _u64x4_to_u16(full_u64)
    else:
        # per-constraint evaluations, padded to m (canonical limbs;
        # Montgomery conversion happens on device in the h pipeline)
        with span("abc_eval"):
            az, bz, cz = _compute_abc_limbs(cs, m)

    if fused:
        assert len(params.h) == m - 1, (len(params.h), m)
        with span("exponent_marshal"):
            a_density, b_density = _densities_cached(cs)
            full_u64 = _assignment_u64(cs)
            aux_u64 = full_u64[cs.num_inputs :]
            a_exps_u64 = full_u64[a_density]
            b_exps_u64 = full_u64[b_density]
        with span("fused_enqueue"):
            fused = _fused_prove_async(
                params, m, az, bz, cz, aux_u64, a_exps_u64, b_exps_u64
            )
        with span("msm_fetch"):
            h_answer = _fetch_g1(fused["h"])
            l_answer = _fetch_g1(fused["l"])
            a_answer = _fetch_g1(fused["a"])
            b1_answer = _fetch_g1(fused["b_g1"])
            b2_answer = _fetch_g2(fused["b_g2"])
        with span("assemble"):
            vk = params.vk
            g_a = vk.delta_g1 * r + vk.alpha_g1 + a_answer
            g_b = vk.delta_g2 * s + vk.beta_g2 + b2_answer
            g_c = vk.delta_g1 * (r * s % R) + vk.alpha_g1 * s + vk.beta_g1 * r
            g_c = g_c + h_answer + l_answer + a_answer * s + b1_answer * r
        return Proof(
            a=_to_affine_host(g_a), b=_to_affine_host_g2(g_b),
            c=_to_affine_host(g_c),
        )

    with span("h_pipeline+msm_enqueue"):
        if use_dev_abc:
            h_coeffs = _compute_h_device(dom, cs, m, v16)  # (m, L) Montgomery
        else:
            h_coeffs = _compute_h_coeffs(dom, az, bz, cz, mesh=mesh)
        # bellman truncates the last coefficient (degree <= m-2)
        h_n = len(params.h)
        assert h_n == m - 1, (h_n, m)

        stacked = "g1_stack" in params.device
        n_g1 = params.device["n_g1"] if stacked else _dev_n(params.device["h"])

        # h scalars stay on device (limb rows or byte digits)
        h_digits = _h_scalar_input(h_coeffs, m, n_g1)

        if not stacked:
            if MSM_BGMW_H and mesh is None and "h_bgmw" in params.device:
                h_dev = _msm_h_bgmw_async(params.device["h_bgmw"], h_digits)
            else:
                h_dev = _msm_g1_async(params.device["h"], h_digits, mesh=mesh)

    # density-filtered exponent vectors (structure static per circuit: cache)
    with span("exponent_marshal"):
        a_density, b_density = _densities_cached(cs)
        if full_u64 is None:
            full_u64 = _assignment_u64(cs)  # (n_vars, 4) u64 LE
        aux_u64 = full_u64[cs.num_inputs :]
        a_exps_u64 = full_u64[a_density]
        b_exps_u64 = full_u64[b_density]
        assert a_exps_u64.shape[0] == len(params.a)
        assert b_exps_u64.shape[0] == len(params.b_g1)

    if stacked:
        # the four G1 MSMs as ONE vmapped program over the (4, N, 72)
        # query stack; G2 enqueued behind it, one fetch at the end
        host3 = np.stack([
            _digits_from_u64(aux_u64, n_g1),
            _digits_from_u64(a_exps_u64, n_g1),
            _digits_from_u64(b_exps_u64, n_g1),
        ])
        digits4 = jnp.concatenate(
            [h_digits[None], jnp.asarray(host3)], axis=0
        )
        g1_dev = _msm_g1_batch_async(params.device["g1_stack"], digits4)
        b2_dev = _msm_g2_async(
            params.device["b_g2"],
            _digits_from_u64(b_exps_u64, _dev_n(params.device["b_g2"])),
        )
        g1_pts = _fetch_g1_batch(g1_dev)
        idx = params.device["g1_index"]
        h_answer = g1_pts[idx["h"]]
        l_answer = g1_pts[idx["l"]]
        a_answer = g1_pts[idx["a"]]
        b1_answer = g1_pts[idx["b_g1"]]
        b2_answer = _fetch_g2(b2_dev)
    else:
        # enqueue all five MSMs back-to-back (async dispatch), fetch once
        # at the end — keeps the device queue full, no host sync per MSM
        with span("msm_enqueue"):
            l_dev = _msm_query_async(params, "l", aux_u64, mesh=mesh)
            a_dev = _msm_query_async(params, "a", a_exps_u64, mesh=mesh)
            b1_dev = _msm_query_async(params, "b_g1", b_exps_u64, mesh=mesh)
            b2_dev = _msm_query_async(params, "b_g2", b_exps_u64, mesh=mesh)
        with span("msm_fetch"):
            h_answer = _fetch_g1(h_dev)
            l_answer = _fetch_query_g1(l_dev)
            a_answer = _fetch_query_g1(a_dev)
            b1_answer = _fetch_query_g1(b1_dev)
            b2_answer = _fetch_query_g2(b2_dev)

    with span("assemble"):
        vk = params.vk
        g_a = vk.delta_g1 * r + vk.alpha_g1 + a_answer
        g_b = vk.delta_g2 * s + vk.beta_g2 + b2_answer
        g_c = vk.delta_g1 * (r * s % R) + vk.alpha_g1 * s + vk.beta_g1 * r
        g_c = g_c + h_answer + l_answer + a_answer * s + b1_answer * r

    return Proof(a=_to_affine_host(g_a), b=_to_affine_host_g2(g_b), c=_to_affine_host(g_c))


def create_proofs_from_assemblies(
    cs_list, params: Parameters, rs_list, mesh=None
) -> list[Proof]:
    """Batch prove: B assignments of the SAME circuit against one params.

    The whole device stream for all B proofs — h pipelines, on-device h
    digit extraction, and 5 MSMs per proof — is enqueued asynchronously
    before any host fetch, so host-side marshalling of proof i+1 overlaps
    device execution of proof i and the device queue never drains. This
    is the TPU shape of the reference's proof-level parallelism (each
    spend/output/convert description proved independently on rayon,
    masp_proofs/src/sapling/prover.rs:51-275)."""
    prepare_device_params(params, mesh=mesh)
    rs_list = list(rs_list)
    if not rs_list:
        return []

    # cs_list may be a lazy iterable (e.g. a witness-synthesis generator):
    # synthesis of proof i+1 then overlaps device execution of proof i
    cs_iter = iter(cs_list)
    m = len(params.h) + 1
    dom = Domain(m)
    stacked = "g1_stack" in params.device
    assert not stacked, "batch proving uses the per-query device layout"
    n_g1 = _dev_n(params.device["h"])

    # bound in-flight proofs: enqueueing everything at once measured
    # SLOWER than serial on v5e-via-relay (deep queues stall the stream);
    # a small window overlaps host marshalling with device execution
    # without drowning the queue
    window = int(os.environ.get("MASP_BATCH_WINDOW", "2"))

    pending = []
    proofs = []
    vk = params.vk

    def drain_one():
        # fetch + ASSEMBLE here, so the host point arithmetic of proof i
        # overlaps device execution of proofs i+1..i+window instead of
        # piling up into an all-host tail after the last fetch (round-4
        # XProf showed the batch's idle concentrated at the boundaries)
        r, s, h_dev, l_dev, a_dev, b1_dev, b2_dev = pending.pop(0)
        h_answer = _fetch_g1(h_dev)
        l_answer = _fetch_query_g1(l_dev)
        a_answer = _fetch_query_g1(a_dev)
        b1_answer = _fetch_query_g1(b1_dev)
        b2_answer = _fetch_query_g2(b2_dev)
        g_a = vk.delta_g1 * r + vk.alpha_g1 + a_answer
        g_b = vk.delta_g2 * s + vk.beta_g2 + b2_answer
        g_c = vk.delta_g1 * (r * s % R) + vk.alpha_g1 * s + vk.beta_g1 * r
        g_c = g_c + h_answer + l_answer + a_answer * s + b1_answer * r
        proofs.append(Proof(a=g_a, b=g_b, c=g_c))

    for cs, (r, s) in zip(cs_iter, rs_list):
        assert 1 << (cs.num_constraints - 1).bit_length() == m
        if len(pending) >= window:
            drain_one()

        batch_fused = MSM_FUSED and mesh is None and MSM_IMPL == "sorted"
        use_dev_abc = ABC_DEVICE and mesh is None and not batch_fused
        a_density, b_density = _densities_cached(cs)
        full_u64 = _assignment_u64(cs)
        aux_u64 = full_u64[cs.num_inputs :]
        a_exps_u64 = full_u64[a_density]
        b_exps_u64 = full_u64[b_density]
        if not use_dev_abc:
            az, bz, cz = _compute_abc_limbs(cs, m)
        if batch_fused:
            fused = _fused_prove_async(
                params, m, az, bz, cz, aux_u64, a_exps_u64, b_exps_u64
            )
            pending.append((
                r, s, fused["h"], [fused["l"]], [fused["a"]],
                [fused["b_g1"]], [fused["b_g2"]],
            ))
            continue
        if use_dev_abc:
            h_coeffs = _compute_h_device(dom, cs, m, _u64x4_to_u16(full_u64))
        else:
            h_coeffs = _compute_h_coeffs(dom, az, bz, cz, mesh=mesh)
        h_digits = _h_scalar_input(h_coeffs, m, n_g1)
        if MSM_BGMW_H and mesh is None and "h_bgmw" in params.device:
            h_dev = _msm_h_bgmw_async(params.device["h_bgmw"], h_digits)
        else:
            h_dev = _msm_g1_async(params.device["h"], h_digits, mesh=mesh)
        l_dev = _msm_query_async(params, "l", aux_u64, mesh=mesh)
        a_dev = _msm_query_async(params, "a", a_exps_u64, mesh=mesh)
        b1_dev = _msm_query_async(params, "b_g1", b_exps_u64, mesh=mesh)
        b2_dev = _msm_query_async(params, "b_g2", b_exps_u64, mesh=mesh)
        pending.append((r, s, h_dev, l_dev, a_dev, b1_dev, b2_dev))

    while pending:
        drain_one()
    return proofs


def _to_affine_host(p: G1) -> G1:
    return p  # host points already affine


def _to_affine_host_g2(p: G2) -> G2:
    return p


def create_random_proof(circuit, params: Parameters, rng) -> Proof:
    r = random_scalar(rng).n
    s = random_scalar(rng).n
    return create_proof(circuit, params, r, s)


__all__ = [
    "create_proof", "create_random_proof", "create_proof_from_assembly",
    "create_proofs_from_assemblies", "prepare_device_params",
    "synthesize_witness",
]

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

MSM_C = 8
# lanes tuned empirically on v5e: 256 lanes cuts main-loop steps but the
# sequential lane-combine then dominates (Output got 30% slower); 64 is
# the round-1 sweet spot.
MSM_LANES_G1 = 64
MSM_LANES_G2 = 32
# "sorted" = sorted-prefix MSM (ops/msm_sorted.py, round-2 design);
# "lanes" = round-1 lane-private-bucket pippenger (ops/msm.py).
MSM_IMPL = os.environ.get("MASP_MSM", "sorted")


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
    """(N, 4) u64 -> (N, 16) uint32 16-bit limbs (vectorized)."""
    n = arr.shape[0]
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
    """(n, 4) u64 LE scalars -> (n_padded, 32) int32 byte digits (c=8)."""
    n = arr.shape[0]
    out = np.zeros((n_padded, 32), dtype=np.int32)
    out[:n] = np.ascontiguousarray(arr).view(np.uint8).reshape(n, 32)
    return out


def _compute_abc_limbs(cs, m):
    """Canonical (non-Montgomery) 16-bit-limb arrays (m, L) of the
    per-constraint a/b/c evaluations; native C++ path when available."""
    from masp_tpu import native

    n = cs.num_constraints
    if native.available():
        indptr, var_idx, coeffs = _csr_for(cs)
        assignment = _assignment_u64(cs)
        vals = native.eval_lc_rows_native(indptr, var_idx, coeffs, assignment)
        limbs = _u64x4_to_limbs16(vals)  # (3n, 16)
        out = []
        for k in range(3):
            part = np.zeros((m, FR.L), dtype=np.uint32)
            part[:n] = limbs[k * n : (k + 1) * n]
            out.append(jnp.asarray(part))
        return out
    a_vals = _eval_lc_rows(cs.a_rows, cs.input_assignment, cs.aux_assignment)
    b_vals = _eval_lc_rows(cs.b_rows, cs.input_assignment, cs.aux_assignment)
    c_vals = _eval_lc_rows(cs.c_rows, cs.input_assignment, cs.aux_assignment)
    pad = m - n
    return [
        jnp.asarray(F.encode(FR, vals + [0] * pad, mont=False))
        for vals in (a_vals, b_vals, c_vals)
    ]


def _compute_h_coeffs(dom: Domain, a_vals, b_vals, c_vals):
    """Device: h(x) coefficients from per-constraint evaluations.

    a_vals/b_vals/c_vals: (m, L) Montgomery limb arrays (zero-padded)."""

    def pipeline(a, b, c):
        # inputs are canonical limbs; convert to Montgomery on device
        a = F.to_mont(FR, a)
        b = F.to_mont(FR, b)
        c = F.to_mont(FR, c)
        a = dom.coset_fft(dom.ifft(a))
        b = dom.coset_fft(dom.ifft(b))
        c = dom.coset_fft(dom.ifft(c))
        t = F.sub(FR, F.mont_mul(FR, a, b), c)
        t = dom.divide_by_z_on_coset(t)
        h = dom.icoset_fft(t)
        return h

    key = ("h_pipeline", dom.m)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(pipeline)
        _JIT_CACHE[key] = fn
    return fn(a_vals, b_vals, c_vals)


_JIT_CACHE: dict = {}


def _msm_g1_async(points_dev, digits):
    """Enqueue a G1 MSM; returns device arrays (no host sync).

    points_dev: packed (N, 72) rows (sorted impl) or (X, Y, Z) coord
    arrays (lanes impl), padded to the shared per-params size."""
    if MSM_IMPL == "sorted":
        from masp_tpu.ops import msm_sorted as MS

        key = ("msm_g1_sorted", points_dev.shape[0])
        fn = _JIT_CACHE.get(key)
        if fn is None:
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


def _msm_g2_async(points_dev, digits):
    if MSM_IMPL == "sorted":
        from masp_tpu.ops import msm_sorted as MS

        key = ("msm_g2_sorted", points_dev.shape[0])
        fn = _JIT_CACHE.get(key)
        if fn is None:
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


def prepare_device_params(params: Parameters) -> None:
    """Encode all proving queries once onto the device (cached in
    params.device). All G1 queries pad to ONE shared size so a single
    compiled MSM program serves h/l/a/b_g1 (power of two for the sorted
    MSM's prefix ladder; packed [X|Y|Z] rows so the per-window reorder is
    one row-gather per point)."""
    if "h" in params.device:
        return
    n_max = max(len(params.h), len(params.l), len(params.a), len(params.b_g1))
    if MSM_IMPL == "sorted":
        from masp_tpu.ops import msm_sorted as MS

        n_pad = _next_pow2(n_max)
        params.device["n_g1"] = n_pad
        for name, pts in (("h", params.h), ("l", params.l), ("a", params.a), ("b_g1", params.b_g1)):
            pts = list(pts) + [G1.identity()] * (n_pad - len(pts))
            coords = tuple(jnp.asarray(x) for x in W.encode_g1_points(pts))
            params.device[name] = jax.device_put(MS.pack_points(coords))
        n2_pad = _next_pow2(len(params.b_g2))
        pts2 = list(params.b_g2) + [G2.identity()] * (n2_pad - len(params.b_g2))
        coords2 = tuple(jnp.asarray(x) for x in W.encode_g2_points(pts2))
        params.device["b_g2"] = jax.device_put(MS.pack_points(coords2))
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
            return WT.fast_witness(circuit)
    cs = ProvingAssembly()
    circuit.synthesize(cs)
    _add_input_constraints(cs)
    return cs


def create_proof(circuit, params: Parameters, r: int, s: int) -> Proof:
    cs = synthesize_witness(circuit)
    return create_proof_from_assembly(cs, params, r, s)


def create_proof_from_assembly(cs, params: Parameters, r: int, s: int) -> Proof:
    prepare_device_params(params)

    m = 1 << (cs.num_constraints - 1).bit_length()
    dom = Domain(m)

    # per-constraint evaluations, padded to m (canonical limbs; Montgomery
    # conversion happens on device in the h pipeline)
    az, bz, cz = _compute_abc_limbs(cs, m)

    h_coeffs = _compute_h_coeffs(dom, az, bz, cz)  # (m, L) Montgomery
    # bellman truncates the last coefficient (degree <= m-2)
    h_n = len(params.h)
    assert h_n == m - 1, (h_n, m)

    # digits for h on device (canonical bytes)
    h_digits_full = M.fr_digits_device(h_coeffs[: m - 1])
    n_h_padded = _dev_n(params.device["h"])
    h_digits = jnp.zeros((n_h_padded, 32), dtype=jnp.int32)
    h_digits = h_digits.at[: m - 1].set(h_digits_full)

    h_dev = _msm_g1_async(params.device["h"], h_digits)

    # density-filtered exponent vectors (structure static per circuit: cache)
    dkey = ("density", cs.num_constraints, cs.num_inputs, cs.num_aux)
    dens = _JIT_CACHE.get(dkey)
    if dens is None:
        dens = _densities(cs)
        _JIT_CACHE[dkey] = dens
    a_density, b_density = dens
    full_u64 = _assignment_u64(cs)  # (n_vars, 4) u64 LE
    aux_u64 = full_u64[cs.num_inputs :]
    a_exps_u64 = full_u64[a_density]
    b_exps_u64 = full_u64[b_density]
    assert a_exps_u64.shape[0] == len(params.a)
    assert b_exps_u64.shape[0] == len(params.b_g1)

    # enqueue all five MSMs back-to-back (async dispatch), fetch once at
    # the end — keeps the device queue full instead of a host sync per MSM
    l_dev = _msm_g1_async(
        params.device["l"],
        _digits_from_u64(aux_u64, _dev_n(params.device["l"])),
    )
    a_dev = _msm_g1_async(
        params.device["a"],
        _digits_from_u64(a_exps_u64, _dev_n(params.device["a"])),
    )
    b1_dev = _msm_g1_async(
        params.device["b_g1"],
        _digits_from_u64(b_exps_u64, _dev_n(params.device["b_g1"])),
    )
    b2_dev = _msm_g2_async(
        params.device["b_g2"],
        _digits_from_u64(b_exps_u64, _dev_n(params.device["b_g2"])),
    )
    h_answer = _fetch_g1(h_dev)
    l_answer = _fetch_g1(l_dev)
    a_answer = _fetch_g1(a_dev)
    b1_answer = _fetch_g1(b1_dev)
    b2_answer = _fetch_g2(b2_dev)

    vk = params.vk
    g_a = vk.delta_g1 * r + vk.alpha_g1 + a_answer
    g_b = vk.delta_g2 * s + vk.beta_g2 + b2_answer
    g_c = vk.delta_g1 * (r * s % R) + vk.alpha_g1 * s + vk.beta_g1 * r
    g_c = g_c + h_answer + l_answer + a_answer * s + b1_answer * r

    return Proof(a=_to_affine_host(g_a), b=_to_affine_host_g2(g_b), c=_to_affine_host(g_c))


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
    "prepare_device_params", "synthesize_witness",
]

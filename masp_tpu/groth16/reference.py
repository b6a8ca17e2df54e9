"""Pure-host reference Groth16 prover (bigint, no JAX).

An independent oracle for the device prover: the same math as
``create_proof_from_assembly`` (bellman create_proof semantics,
SURVEY.md §3.1) executed with Python integers and host curve ops.
O(m log m) NTTs and O(n) scalar muls — only usable at test shapes, which
is the point: the driver dryrun and the mesh tests compare the sharded
device pipeline against this end to end.
"""

from __future__ import annotations

from masp_tpu.curves.bls12_381 import R
from masp_tpu.groth16.domain import Domain
from masp_tpu.groth16.generator import _densities
from masp_tpu.groth16.structures import Proof


def _fft(vals: list[int], om: int) -> list[int]:
    m = len(vals)
    if m == 1:
        return list(vals)
    om2 = om * om % R
    even = _fft(vals[0::2], om2)
    odd = _fft(vals[1::2], om2)
    out = [0] * m
    w = 1
    for i in range(m // 2):
        t = w * odd[i] % R
        out[i] = (even[i] + t) % R
        out[i + m // 2] = (even[i] - t) % R
        w = w * om % R
    return out


def _eval_rows(rows, inputs, aux):
    out = []
    for row in rows:
        acc = 0
        for v, c in row:
            val = inputs[v // 2] if v % 2 == 0 else aux[v // 2]
            acc += c * val
        out.append(acc % R)
    return out


def host_h_from_vals(a_vals, b_vals, c_vals, m: int) -> list[int]:
    """h(x) coefficients from per-constraint evaluation lists (canonical
    ints, zero-padded to m internally)."""
    dom = Domain(m)

    def coset_eval(vals):
        vals = list(vals) + [0] * (m - len(vals))
        coeffs = _fft(vals, dom.omega_inv)
        coeffs = [v * dom.m_inv % R for v in coeffs]  # ifft
        coeffs = [v * pow(dom.g, i, R) % R for i, v in enumerate(coeffs)]
        return _fft(coeffs, dom.omega)

    a = coset_eval(a_vals)
    b = coset_eval(b_vals)
    c = coset_eval(c_vals)
    t = [(x * y - z) * dom.z_on_coset_inv % R for x, y, z in zip(a, b, c)]
    h = _fft(t, dom.omega_inv)
    h = [v * dom.m_inv % R for v in h]
    h = [v * pow(dom.g_inv, i, R) % R for i, v in enumerate(h)]
    return h


def host_h_coeffs(cs, m: int) -> list[int]:
    """h(x) quotient coefficients (degree <= m-2), canonical ints."""
    inputs = list(cs.input_assignment)
    aux = list(cs.aux_assignment)
    return host_h_from_vals(
        _eval_rows(cs.a_rows, inputs, aux),
        _eval_rows(cs.b_rows, inputs, aux),
        _eval_rows(cs.c_rows, inputs, aux),
        m,
    )


def _host_msm(points, scalars):
    acc = type(points[0]).identity()
    for p, s in zip(points, scalars):
        if s:
            acc = acc + p * s
    return acc


def host_proof(cs, params, r: int, s: int) -> Proof:
    """The proof create_proof_from_assembly must produce, computed on host."""
    m = 1 << (cs.num_constraints - 1).bit_length()
    h = host_h_coeffs(cs, m)[: m - 1]

    inputs = list(cs.input_assignment)
    aux = list(cs.aux_assignment)
    full = inputs + aux
    a_density, b_density = _densities(cs)
    a_exps = [full[i] for i in range(len(full)) if a_density[i]]
    b_exps = [full[i] for i in range(len(full)) if b_density[i]]

    h_ans = _host_msm(params.h, h)
    l_ans = _host_msm(params.l, aux)
    a_ans = _host_msm(params.a, a_exps)
    b1_ans = _host_msm(params.b_g1, b_exps)
    b2_ans = _host_msm(params.b_g2, b_exps)

    vk = params.vk
    g_a = vk.delta_g1 * r + vk.alpha_g1 + a_ans
    g_b = vk.delta_g2 * s + vk.beta_g2 + b2_ans
    g_c = vk.delta_g1 * (r * s % R) + vk.alpha_g1 * s + vk.beta_g1 * r
    g_c = g_c + h_ans + l_ans + a_ans * s + b1_ans * r
    return Proof(a=g_a, b=g_b, c=g_c)


__all__ = ["host_proof", "host_h_coeffs", "host_h_from_vals"]

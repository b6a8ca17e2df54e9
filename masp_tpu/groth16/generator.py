"""Groth16 parameter generation (bellman ``generate_random_parameters``
semantics, SURVEY.md §7 Phase 5) with the heavy G1/G2 scalar-mul batches on
TPU via windowed fixed-base kernels.

Needed because real MPC parameters exist only for the three production
circuits; tests and benches generate fresh parameters per circuit, exactly
like the reference's benches (masp_proofs/benches/sapling.rs:24-36).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from masp_tpu.curves.bls12_381 import G1, G2, R
from masp_tpu.groth16.structures import Parameters, VerifyingKey
from masp_tpu.ops import msm as M
from masp_tpu.ops import weierstrass_jax as W
from masp_tpu.r1cs.cs import KeypairAssembly, lc_var, var_input
from masp_tpu.utils.rng import random_scalar


def _add_input_constraints(cs):
    """One x*0=0 constraint per input, ensuring full density of the IC query
    (bellman generator/prover both do this)."""
    from masp_tpu.r1cs.cs import lc

    for i in range(cs.num_inputs):
        cs.enforce("", lc_var(var_input(i)), lc(), lc())


def _densities(cs):
    """Per-variable (inputs then aux) appearance masks in A and B."""
    n_vars = cs.num_inputs + cs.num_aux

    def var_pos(v):
        return (v // 2) if v % 2 == 0 else cs.num_inputs + v // 2

    a_density = np.zeros(n_vars, dtype=bool)
    b_density = np.zeros(n_vars, dtype=bool)
    for row in cs.a_rows:
        for v, _c in row:
            a_density[var_pos(v)] = True
    for row in cs.b_rows:
        for v, _c in row:
            b_density[var_pos(v)] = True
    return a_density, b_density


def _eval_at_tau(cs, tau: int, m: int):
    """u_i(tau), v_i(tau), w_i(tau) per variable via Lagrange evaluation."""
    from masp_tpu.groth16.domain import Domain

    dom = Domain(m)
    omega = dom.omega
    n_constraints = cs.num_constraints

    # L_j(tau) = (tau^m - 1) * omega^j / (m * (tau - omega^j))
    zt = (pow(tau, m, R) - 1) % R
    omega_pows = []
    cur = 1
    for _ in range(n_constraints):
        omega_pows.append(cur)
        cur = cur * omega % R
    denoms = [(m * (tau - op)) % R for op in omega_pows]
    # batch invert
    prefix = [1] * (len(denoms) + 1)
    for i, d in enumerate(denoms):
        prefix[i + 1] = prefix[i] * d % R
    inv_all = pow(prefix[-1], -1, R)
    invs = [0] * len(denoms)
    for i in range(len(denoms) - 1, -1, -1):
        invs[i] = inv_all * prefix[i] % R
        inv_all = inv_all * denoms[i] % R
    lag = [zt * op % R * inv % R for op, inv in zip(omega_pows, invs)]

    n_vars = cs.num_inputs + cs.num_aux

    def var_pos(v):
        return (v // 2) if v % 2 == 0 else cs.num_inputs + v // 2

    u = [0] * n_vars
    v = [0] * n_vars
    w = [0] * n_vars
    for j, row in enumerate(cs.a_rows):
        lj = lag[j]
        for var, coeff in row:
            p = var_pos(var)
            u[p] = (u[p] + coeff * lj) % R
    for j, row in enumerate(cs.b_rows):
        lj = lag[j]
        for var, coeff in row:
            p = var_pos(var)
            v[p] = (v[p] + coeff * lj) % R
    for j, row in enumerate(cs.c_rows):
        lj = lag[j]
        for var, coeff in row:
            p = var_pos(var)
            w[p] = (w[p] + coeff * lj) % R
    return u, v, w, dom


_G1_TABLE_CACHE = {}
_G2_TABLE_CACHE = {}


def _g1_table():
    if "t" not in _G1_TABLE_CACHE:
        table = M.fixed_base_table(G1.generator(), c=8, num_bits=256)
        TX, TY, TZ = [], [], []
        for row in table:
            x, y, z = W.encode_g1_points(row)
            TX.append(x)
            TY.append(y)
            TZ.append(z)
        _G1_TABLE_CACHE["t"] = tuple(
            jnp.asarray(np.stack(v)) for v in (TX, TY, TZ)
        )
    return _G1_TABLE_CACHE["t"]


def _g2_table():
    if "t" not in _G2_TABLE_CACHE:
        table = M.fixed_base_table(G2.generator(), c=8, num_bits=256)
        TX, TY, TZ = [], [], []
        for row in table:
            x, y, z = W.encode_g2_points(row)
            TX.append(x)
            TY.append(y)
            TZ.append(z)
        _G2_TABLE_CACHE["t"] = tuple(
            jnp.asarray(np.stack(v)) for v in (TX, TY, TZ)
        )
    return _G2_TABLE_CACHE["t"]


_fb_g1 = jax.jit(
    lambda t, d: W.to_affine(W.G1Ops, M.fixed_base_scalarmuls(W.G1Ops, t, d))
)
_fb_g2 = jax.jit(
    lambda t, d: W.to_affine(W.G2Ops, M.fixed_base_scalarmuls(W.G2Ops, t, d))
)


def _chunk_pad(n: int, chunk: int, floor: int = 1 << 9) -> int:
    """Pad size for a chunk of n scalars: the next power of two, clamped
    to [floor, chunk]. Production queries fill whole chunks (one compiled
    program); tiny test circuits (n ~ 10) pad to `floor` instead of the
    full chunk — a full 2^16 fixed-base mul per query made tiny-circuit
    param-gen take ~10 min on CPU. Power-of-two sizing bounds the
    distinct compiled programs at log2(chunk/floor)+1 per group."""
    if n >= chunk:
        return chunk
    return max(floor, 1 << (n - 1).bit_length())


def batch_g1_mul_gen(scalars: list[int], chunk: int = 1 << 16):
    """[s_i] G1_generator for many scalars, on TPU. Returns host G1 list."""
    out = []
    table = _g1_table()
    for off in range(0, len(scalars), chunk):
        part = scalars[off : off + chunk]
        n = len(part)
        pad = _chunk_pad(n, chunk)
        digits = jnp.asarray(M.scalars_to_digits(part + [0] * (pad - n), 8, 256))
        ax, ay = _fb_g1(table, digits)
        out.extend(_decode_affine_g1(ax[:n], ay[:n]))
    return out


def batch_g2_mul_gen(scalars: list[int], chunk: int = 1 << 14):
    out = []
    table = _g2_table()
    for off in range(0, len(scalars), chunk):
        part = scalars[off : off + chunk]
        n = len(part)
        pad = _chunk_pad(n, chunk)
        digits = jnp.asarray(M.scalars_to_digits(part + [0] * (pad - n), 8, 256))
        ax, ay = _fb_g2(table, digits)
        out.extend(_decode_affine_g2(ax[:n], ay[:n]))
    return out


def _decode_affine_g1(ax, ay):
    from masp_tpu.curves.bls12_381 import _FqElt

    xs = W.FqOps.decode(ax)
    ys = W.FqOps.decode(ay)
    return [
        G1.identity() if (x == 0 and y == 0) else G1.from_xy(_FqElt(x), _FqElt(y))
        for x, y in zip(xs, ys)
    ]


def _decode_affine_g2(ax, ay):
    from masp_tpu.curves.bls12_381 import Fq2

    xs = W.Fq2Ops.decode(ax)
    ys = W.Fq2Ops.decode(ay)
    return [
        G2.identity()
        if (x == (0, 0) and y == (0, 0))
        else G2.from_xy(Fq2(*x), Fq2(*y))
        for x, y in zip(xs, ys)
    ]


def generate_parameters(
    circuit, tau: int, alpha: int, beta: int, gamma: int, delta: int
) -> Parameters:
    cs = KeypairAssembly()
    circuit.synthesize(cs)
    _add_input_constraints(cs)

    m = 1 << (cs.num_constraints - 1).bit_length()
    u, v, w, dom = _eval_at_tau(cs, tau, m)
    a_density, b_density = _densities(cs)
    n_inputs = cs.num_inputs

    gamma_inv = pow(gamma, -1, R)
    delta_inv = pow(delta, -1, R)

    ic_scalars = [
        (beta * u[i] + alpha * v[i] + w[i]) % R * gamma_inv % R
        for i in range(n_inputs)
    ]
    l_scalars = [
        (beta * u[i] + alpha * v[i] + w[i]) % R * delta_inv % R
        for i in range(n_inputs, len(u))
    ]
    a_scalars = [u[i] for i in range(len(u)) if a_density[i]]
    b_scalars = [v[i] for i in range(len(v)) if b_density[i]]
    # h query: tau^i * Z(tau) / delta for i in 0..m-2
    zt = (pow(tau, m, R) - 1) % R
    zd = zt * delta_inv % R
    h_scalars = []
    cur = zd
    for _ in range(m - 1):
        h_scalars.append(cur)
        cur = cur * tau % R

    h = batch_g1_mul_gen(h_scalars)
    l = batch_g1_mul_gen(l_scalars)
    a = batch_g1_mul_gen(a_scalars)
    b_g1 = batch_g1_mul_gen(b_scalars)
    b_g2 = batch_g2_mul_gen(b_scalars)
    ic = batch_g1_mul_gen(ic_scalars)

    g1 = G1.generator()
    g2 = G2.generator()
    vk = VerifyingKey(
        alpha_g1=g1 * alpha,
        beta_g1=g1 * beta,
        beta_g2=g2 * beta,
        gamma_g2=g2 * gamma,
        delta_g1=g1 * delta,
        delta_g2=g2 * delta,
        ic=ic,
    )
    return Parameters(vk=vk, h=h, l=l, a=a, b_g1=b_g1, b_g2=b_g2)


def generate_random_parameters(circuit, rng) -> Parameters:
    def nonzero():
        while True:
            x = random_scalar(rng)
            if not x.is_zero():
                return x.n

    return generate_parameters(
        circuit, nonzero(), nonzero(), nonzero(), nonzero(), nonzero()
    )


__all__ = [
    "generate_parameters", "generate_random_parameters", "batch_g1_mul_gen",
    "batch_g2_mul_gen",
]

"""Sharded-NTT tests on the virtual 8-device CPU mesh (compact impl).

The ppermute-butterfly path must agree bit-for-bit with the
single-device Domain transforms (groth16/domain.py), which themselves
match bellman's EvaluationDomain semantics. One test = one compiled
program set (shard_map compiles are the cost here, not the math).
"""

import random

import jax.numpy as jnp

from masp_tpu.fields import SCALAR_MODULUS
from masp_tpu.groth16.domain import Domain
from masp_tpu.ops import field_jax as F
from masp_tpu.ops.field_jax import FR
from masp_tpu.parallel import mesh as PM


def test_sharded_ntt_matches_and_roundtrips():
    m = 64
    dom = Domain(m)
    rng = random.Random(21)
    vals = [rng.randrange(SCALAR_MODULUS) for _ in range(m)]
    x = jnp.asarray(F.encode(FR, vals))
    mesh = PM.make_mesh(8, axis="ntt")

    fwd = PM.sharded_ntt(mesh, dom, x, axis="ntt")
    assert F.decode(FR, fwd) == F.decode(FR, dom.fft(x))

    back = F.decode(FR, PM.sharded_ntt(mesh, dom, fwd, axis="ntt", inverse=True))
    assert back == vals


def test_sharded_ntt_degenerate_single_device():
    m = 16
    dom = Domain(m)
    rng = random.Random(23)
    vals = [rng.randrange(SCALAR_MODULUS) for _ in range(m)]
    x = jnp.asarray(F.encode(FR, vals))
    mesh = PM.make_mesh(1, axis="ntt")
    got = F.decode(FR, PM.sharded_ntt(mesh, dom, x, axis="ntt"))
    assert got == F.decode(FR, dom.fft(x))


def test_sharded_sorted_msm_matches_single_device():
    import numpy as np

    from masp_tpu.curves.bls12_381 import G1
    from masp_tpu.ops import msm as M
    from masp_tpu.ops import msm_sorted as MS
    from masp_tpu.ops import weierstrass_jax as W

    nprng = np.random.default_rng(31)
    n = 64
    g = G1.generator()
    points = [g * int(k) for k in nprng.integers(1, 1 << 40, n)]
    scalars = [int.from_bytes(nprng.bytes(32), "little") % SCALAR_MODULUS for _ in range(n)]
    coords = tuple(np.asarray(x) for x in W.encode_g1_points(points))
    packed = MS.pack_points(coords)
    digits = jnp.asarray(M.scalars_to_digits(scalars, 8, 256))

    mesh = PM.make_mesh(4, axis="msm")
    got = PM.sharded_sorted_msm(mesh, W.G1Ops, packed, digits, 8, axis="msm")
    want = MS.sorted_msm(W.G1Ops, packed, digits, 8)
    import numpy as _np

    a = W.decode_g1_points(*(_np.asarray(x)[None] for x in got))[0]
    b = W.decode_g1_points(*(_np.asarray(x)[None] for x in want))[0]
    assert a == b


def test_sharded_h_pipeline_matches_single_device_and_host():
    from masp_tpu.groth16 import prover as PR
    from masp_tpu.groth16.reference import host_h_from_vals

    m = 64
    dom = Domain(m)
    rng = random.Random(41)
    vals = [
        [rng.randrange(SCALAR_MODULUS) for _ in range(m)] for _ in range(3)
    ]
    az, bz, cz = (jnp.asarray(F.encode(FR, v, mont=False)) for v in vals)
    mesh = PM.make_mesh(4, axis="msm")
    got = PM.sharded_h_pipeline(mesh, dom, az, bz, cz, axis="msm")
    want = PR._compute_h_coeffs(dom, az, bz, cz)
    assert F.decode(FR, got) == F.decode(FR, want)
    # three-way: the pure-host bigint reference pipeline agrees too
    assert F.decode(FR, got) == host_h_from_vals(*vals, m)


import os

import pytest


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("MASP_E2E"),
    reason="~10 min of CPU XLA compiles; the driver dryrun covers the "
    "mesh prover path (run with MASP_E2E=1)",
)
def test_mesh_prove_bit_exact(monkeypatch):
    """create_proof_from_assembly(mesh=) must produce the identical proof
    as the single-device path (production wiring for VERDICT item 4)."""
    import numpy as np

    from masp_tpu.curves.bls12_381 import G1, G2
    from masp_tpu.fields import SCALAR_MODULUS as R
    from masp_tpu.groth16 import prover as PR
    from masp_tpu.groth16.generator import _add_input_constraints, _densities
    from masp_tpu.groth16.structures import Parameters, VerifyingKey
    from masp_tpu.r1cs.cs import ProvingAssembly, lc_var

    # squaring-chain circuit: enough constraints for real shards (m = 64)
    class Chain:
        def __init__(self, x, k):
            self.x, self.k = x, k

        def synthesize(self, cs):
            v = cs.alloc("x0", self.x)
            cur = self.x
            for i in range(self.k):
                nxt = cur * cur % R
                nv = cs.alloc(f"x{i+1}", nxt)
                cs.enforce(f"sq{i}", lc_var(v), lc_var(v), lc_var(nv))
                v, cur = nv, nxt
            out = cs.alloc_input("out", cur)
            from masp_tpu.r1cs.cs import ONE

            cs.enforce("out", lc_var(v), lc_var(ONE), lc_var(out))

    monkeypatch.setattr(PR, "MSM_C", 4)  # B=16: CPU-feasible bucket reduce
    PR._JIT_CACHE.clear()

    cs = ProvingAssembly()
    Chain(12345, 60).synthesize(cs)
    _add_input_constraints(cs)
    m = 1 << (cs.num_constraints - 1).bit_length()
    a_density, b_density = _densities(cs)

    # random-but-consistent-size parameters (prover only needs shapes; the
    # mesh-vs-single comparison is bit-exactness, not verifiability)
    nprng = np.random.default_rng(7)
    g1 = lambda: G1.generator() * int(nprng.integers(1, 1 << 40))
    g2 = lambda: G2.generator() * int(nprng.integers(1, 1 << 40))
    vk = VerifyingKey(
        alpha_g1=g1(), beta_g1=g1(), beta_g2=g2(), gamma_g2=g2(),
        delta_g1=g1(), delta_g2=g2(),
        ic=[g1() for _ in range(cs.num_inputs)],
    )
    params = Parameters(
        vk=vk,
        h=[g1() for _ in range(m - 1)],
        l=[g1() for _ in range(cs.num_aux)],
        a=[g1() for _ in range(int(a_density.sum()))],
        b_g1=[g1() for _ in range(int(b_density.sum()))],
        b_g2=[g2() for _ in range(int(b_density.sum()))],
    )

    single = PR.create_proof_from_assembly(cs, params, 11, 22)
    mesh = PM.make_mesh(4, axis="msm")
    sharded = PR.create_proof_from_assembly(cs, params, 11, 22, mesh=mesh)
    assert sharded == single
    # independent pure-host bigint oracle
    from masp_tpu.groth16.reference import host_proof

    assert sharded == host_proof(cs, params, 11, 22)

    # pipelined batch prove: same (r, s) => bit-identical proofs
    batch = PR.create_proofs_from_assemblies(
        [cs, cs], params, [(11, 22), (33, 44)]
    )
    assert batch[0] == single
    assert batch[1] == host_proof(cs, params, 33, 44)

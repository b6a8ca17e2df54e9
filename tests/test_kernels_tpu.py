"""Pallas kernel tests — run only on real TPU hardware (Mosaic kernels;
interpret mode would recompile via XLA and defeat the point).

On CPU CI these skip; the same math is covered by the compact-impl tests.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires TPU (Mosaic kernels)"
)


def test_pallas_mont_mul_matches_host():
    from masp_tpu.curves.bls12_381 import Q
    from masp_tpu.kernels import field_kernels as K
    from masp_tpu.ops import field_jax as F

    rng = random.Random(3)
    xs = [rng.randrange(Q) for _ in range(512)]
    ys = [rng.randrange(Q) for _ in range(512)]
    a = jnp.asarray(F.encode(F.FQ, xs))
    b = jnp.asarray(F.encode(F.FQ, ys))
    got = F.decode(F.FQ, K.pallas_mont_mul(F.FQ, a, b))
    assert all(g == x * y % Q for g, x, y in zip(got, xs, ys))


def test_pallas_point_add_matches_host():
    from masp_tpu.curves.bls12_381 import G1, R
    from masp_tpu.kernels import field_kernels as K
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops import weierstrass_jax as W

    rng = random.Random(4)
    pts1 = [G1.generator() * rng.randrange(R) for _ in range(63)] + [G1.identity()]
    pts2 = [G1.generator() * rng.randrange(R) for _ in range(63)] + [G1.identity()]
    P = tuple(map(jnp.asarray, W.encode_g1_points(pts1)))
    Q_ = tuple(map(jnp.asarray, W.encode_g1_points(pts2)))
    out = K.pallas_point_add("g1", P, Q_, (F.FQ.L,))
    got = W.decode_g1_points(*out)
    assert all(g == (x + y) for g, x, y in zip(got, pts1, pts2))


def test_pallas_point_add01_matches_host():
    """The leaf-level specialized add (Z in {0, mont-1}) must agree with
    the host on every affine/identity combination, for G1 and G2."""
    from masp_tpu.curves.bls12_381 import G1, G2, R
    from masp_tpu.kernels import field_kernels as K
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops import weierstrass_jax as W

    rng = random.Random(5)
    for grp, kind, enc, dec, cshape in (
        (G1, "g1", W.encode_g1_points, W.decode_g1_points, (F.FQ.L,)),
        (G2, "g2", W.encode_g2_points, W.decode_g2_points, (2, F.FQ.L)),
    ):
        pts1 = [grp.generator() * rng.randrange(1, R) for _ in range(29)]
        pts2 = [grp.generator() * rng.randrange(1, R) for _ in range(29)]
        # identity x point, point x identity, identity x identity, P + P,
        # P + (-P)
        pts1 += [grp.identity(), pts1[0], grp.identity(), pts1[1], pts1[2]]
        pts2 += [pts2[0], grp.identity(), grp.identity(), pts1[1], -pts1[2]]
        P = tuple(map(jnp.asarray, enc(pts1)))
        Q_ = tuple(map(jnp.asarray, enc(pts2)))
        out = K.pallas_point_add01(kind, P, Q_, cshape)
        got = dec(*out)
        for g, x, y in zip(got, pts1, pts2):
            assert g == (x + y), (kind, x, y)


def test_sorted_msm_pallas_matches_host():
    """The production MSM (pallas mode) vs a host bigint MSM — the
    pallas-only regression guard VERDICT asked for (tests ran compact)."""
    from masp_tpu.curves.bls12_381 import G1, R
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops import msm as M
    from masp_tpu.ops import msm_sorted as MS
    from masp_tpu.ops import weierstrass_jax as W

    rng = random.Random(11)
    n = 512
    points = [G1.generator() * rng.randrange(1, R) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[0] = 0
    points[1] = G1.identity()
    coords = tuple(map(np.asarray, W.encode_g1_points(points)))
    digits = jnp.asarray(M.scalars_to_digits(scalars, 8, 256))
    out = MS.sorted_msm(W.G1Ops, MS.pack_points(coords), digits, 8)
    got = W.decode_g1_points(*(np.asarray(x)[None] for x in out))[0]
    want = G1.identity()
    for p, s in zip(points, scalars):
        want = want + p * s
    assert got == want


def test_h_pipeline_pallas_matches_host():
    """The quotient pipeline (pallas NTTs) vs the pure-host bigint
    pipeline (groth16/reference.py)."""
    from masp_tpu.fields import SCALAR_MODULUS
    from masp_tpu.groth16.domain import Domain
    from masp_tpu.groth16.prover import _compute_h_coeffs
    from masp_tpu.groth16.reference import host_h_from_vals
    from masp_tpu.ops import field_jax as F
    from masp_tpu.ops.field_jax import FR

    rng = random.Random(12)
    m = 256
    vals = [[rng.randrange(SCALAR_MODULUS) for _ in range(m)] for _ in range(3)]
    az, bz, cz = (jnp.asarray(F.encode(FR, v, mont=False)) for v in vals)
    got = F.decode(FR, _compute_h_coeffs(Domain(m), az, bz, cz))
    assert got == host_h_from_vals(*vals, m)


def test_full_prove_pallas_cached_params():
    """Full Output prove + verify in pallas mode against the cached bench
    parameters (skips when the cache is cold to keep this test hermetic)."""
    import pathlib

    if not list(pathlib.Path(".params_cache").glob("output-test-*.params")):
        pytest.skip("no cached output-test params (run bench.py first)")

    import bench as B
    from masp_tpu.circuits.sapling import Output
    from masp_tpu.groth16.params_io import cached_test_params
    from masp_tpu.groth16.prover import create_proof_from_assembly, synthesize_witness
    from masp_tpu.groth16.structures import prepare_verifying_key
    from masp_tpu.groth16.verifier import verify_proof
    from masp_tpu.utils.rng import XorShiftRng

    rng = XorShiftRng.from_seed(bytes(range(16)))
    make_circuit, public_inputs = B._output_fixture(rng)
    params = cached_test_params("output-test", Output, rng)
    pvk = prepare_verifying_key(params.vk)
    cs = synthesize_witness(make_circuit())
    proof = create_proof_from_assembly(cs, params, 77, 88)
    assert verify_proof(pvk, proof, public_inputs)
    assert not verify_proof(pvk, proof, [x + 1 for x in public_inputs])

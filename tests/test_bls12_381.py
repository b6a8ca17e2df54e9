"""BLS12-381 group, serialization, and pairing tests (host gold layer)."""

import pytest

from masp_tpu.curves.bls12_381 import (
    G1, G2, R, Fq2, pairing, pairing_product_is_one,
)


def test_generators_valid():
    g1, g2 = G1.generator(), G2.generator()
    assert g1.is_on_curve() and g2.is_on_curve()
    assert g1.is_torsion_free() and g2.is_torsion_free()
    assert (g1 * R).is_identity() and (g2 * R).is_identity()


def test_group_law():
    g = G1.generator()
    assert g.double() == g + g
    assert (g * 5) == g + g + g + g + g
    assert (g - g).is_identity()
    h = G2.generator()
    assert h.double() == h + h
    assert (h * 3) == h + h + h


def test_canonical_compressed_encodings():
    # Canonical encodings from the BLS12-381 spec.
    assert G1.generator().to_compressed().hex() == (
        "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
        "6c55e83ff97a1aeffb3af00adb22c6bb"
    )
    assert G2.generator().to_compressed().hex() == (
        "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
        "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
        "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
    )


@pytest.mark.parametrize("k", [1, 2, 777, 123456789])
def test_serialization_roundtrip(k):
    p = G1.generator() * k
    assert G1.from_uncompressed(p.to_uncompressed()) == p
    assert G1.from_compressed(p.to_compressed()) == p
    q = G2.generator() * k
    assert G2.from_uncompressed(q.to_uncompressed()) == q
    assert G2.from_compressed(q.to_compressed()) == q


def test_identity_serialization():
    assert G1.from_compressed(G1.identity().to_compressed()).is_identity()
    assert G2.from_compressed(G2.identity().to_compressed()).is_identity()
    assert G1.from_uncompressed(G1.identity().to_uncompressed()).is_identity()
    assert G2.from_uncompressed(G2.identity().to_uncompressed()).is_identity()


def test_bad_encodings_rejected():
    assert G1.from_compressed(b"\x00" * 48) is None  # no compression bit
    assert G1.from_uncompressed(b"\xff" * 96) is None
    # x not on curve
    bad = bytearray(G1.generator().to_compressed())
    bad[47] ^= 1
    # either decompression fails or subgroup check fails
    p = G1.from_compressed(bytes(bad))
    assert p is None or not p.is_torsion_free()


def test_pairing_bilinearity():
    g1, g2 = G1.generator(), G2.generator()
    e = pairing(g1, g2)
    assert not e.is_one()
    a, b = 12345, 67890
    assert pairing(g1 * a, g2 * b) == e.pow(a * b % R)


def test_pairing_product():
    g1, g2 = G1.generator(), G2.generator()
    a, b = 1111, 2222
    assert pairing_product_is_one([(g1 * (a * b % R), g2), (-(g1 * a), g2 * b)])
    assert not pairing_product_is_one([(g1 * 2, g2), (-(g1 * 3), g2)])


def test_fq2_sqrt():
    x = Fq2(1234567, 7654321)
    s = x.square().sqrt()
    assert s is not None and s.square() == x.square()


def test_final_exponentiation_chain_exact():
    """The u-parameter hard-part chain computes exactly f^((q^4-q^2+1)/r)
    (not the f^(3d) shortcut) — checked against the naive integer
    exponentiation on a real Miller-loop output, plus the integer
    identity the chain relies on."""
    from masp_tpu.curves.bls12_381 import (
        BLS_X, Q, _final_exponentiation_naive, final_exponentiation,
        multi_miller_loop,
    )

    u = -BLS_X
    d = (Q**4 - Q**2 + 1) // R
    assert (u - 1) % 3 == 0
    assert ((u - 1) // 3) * (u - 1) * (u + Q) * (u * u + Q * Q - 1) + 1 == d

    f = multi_miller_loop([(G1.generator() * 987654321, G2.generator() * 123456789)])
    assert final_exponentiation(f) == _final_exponentiation_naive(f)


def test_fq12_complex_squaring():
    from masp_tpu.curves.bls12_381 import Fq12, multi_miller_loop
    f = multi_miller_loop([(G1.generator() * 31337, G2.generator() * 271828)])
    assert f.square() == f * f
    assert Fq12.one().square() == Fq12.one()


def test_multi_miller_fast_matches_untwisted_oracle():
    """The twisted-coordinate sparse-line Miller loop is bit-identical to
    the untwisted E(Fq12) oracle, including mixed identity pairs."""
    from masp_tpu.curves.bls12_381 import (
        _multi_miller_loop_untwisted, multi_miller_loop,
    )
    g1, g2 = G1.generator(), G2.generator()
    pairs = [
        (g1 * 0xDEADBEEF, g2 * 0xCAFEBABE),
        (-(g1 * 77), g2 * 91),
        (G1.identity(), g2 * 5),
        (g1 * 3, G2.identity()),
    ]
    assert multi_miller_loop(pairs) == _multi_miller_loop_untwisted(pairs)
    assert multi_miller_loop([(G1.identity(), g2)]).is_one()


def test_jacobian_scalar_mul_matches_affine():
    """Jacobian-ladder mul_int is point-identical to the affine oracle,
    including 0, negatives, and scalars around the group order."""
    g1, g2 = G1.generator(), G2.generator()
    for pt in (g1, g2):
        for k in (0, 1, 2, 3, R - 1, R, R + 1, -5, 0xDEADBEEFCAFEBABE1234567890ABCDEF):
            assert pt.mul_int(k) == pt._mul_int_affine(k)


def test_multi_scalar_mul_matches_naive_sum():
    """Shared-doubling multi-exp equals the naive sum of scalar muls,
    with zero/negative scalars and identity points mixed in."""
    g1 = G1.generator()
    pts = [g1 * 3, g1 * 1717, G1.identity(), g1 * 99, -(g1 * 2)]
    ks = [0xDEAD, -12345, 7, 0, R + 2]
    ref = G1.identity()
    for p, k in zip(pts, ks):
        ref = ref + p._mul_int_affine(k)
    assert G1.multi_scalar_mul(pts, ks) == ref
    assert G1.multi_scalar_mul([], []).is_identity()
    assert G1.multi_scalar_mul([g1], [0]).is_identity()


def test_degenerate_pairing_input_guard():
    """ADVICE round 4: a vanishing Miller slope denominator (possible only
    for out-of-subgroup inputs, e.g. Proof.read(check_subgroup=False))
    must surface as DegeneratePairingInput and make verifiers return
    False, never crash — the reference blst projective loop never
    divides and cannot panic."""
    import masp_tpu.groth16.verifier as V
    from masp_tpu.curves.bls12_381 import (
        DegeneratePairingInput, Fq2, _batch_inv_fq2,
    )

    with pytest.raises(DegeneratePairingInput):
        _batch_inv_fq2([Fq2(1, 0), Fq2(0, 0), Fq2(3, 4)])

    # verify_proof / verify_proofs_batch catch the error -> False
    def boom(pairs):
        raise DegeneratePairingInput("test")

    class _PVK:
        ic = [None, None]
        neg_gamma_g2 = None
        neg_delta_g2 = None
        alpha_g1_beta_g2 = None
        alpha_g1 = None

    class _Proof:
        a = G1.generator()
        b = None
        c = G1.generator()

    orig = V.multi_miller_loop
    orig_msm = G1.multi_scalar_mul
    try:
        V.multi_miller_loop = boom
        G1.multi_scalar_mul = staticmethod(lambda pts, sc: G1.identity())
        assert V.verify_proof(_PVK(), _Proof(), [1]) is False
    finally:
        V.multi_miller_loop = orig
        G1.multi_scalar_mul = orig_msm

"""sorted_msm vs host reference and vs the round-1 pippenger_msm."""

import numpy as np
import pytest

from masp_tpu.curves.bls12_381 import G1, G2, R
from masp_tpu.ops import msm as M
from masp_tpu.ops import msm_sorted as MS
from masp_tpu.ops import weierstrass_jax as W


def _host_msm(points, scalars):
    acc = type(points[0]).identity()
    for p, s in zip(points, scalars):
        acc = acc + p * s
    return acc


def _rand_scalars(rng, n):
    return [int.from_bytes(rng.bytes(32), "little") % R for _ in range(n)]


@pytest.mark.parametrize("c", [4, 8])
def test_sorted_msm_g1(c):
    rng = np.random.default_rng(5)
    n = 64
    g = G1.generator()
    points = [g * (int(rng.integers(1, 1 << 62))) for _ in range(n)]
    scalars = _rand_scalars(rng, n)
    # a couple of zero scalars and identity points (padding shapes)
    scalars[3] = 0
    points[7] = G1.identity()

    coords = [np.asarray(x) for x in W.encode_g1_points(points)]
    digits = M.scalars_to_digits(scalars, c, 256)
    packed = MS.pack_points(tuple(coords))
    out = MS.sorted_msm(W.G1Ops, packed, digits, c)
    got = W.decode_g1_points(*(np.asarray(x)[None] for x in out))[0]
    assert got == _host_msm(points, scalars)


def test_sorted_msm_wide_reduce_flag():
    """MASP_MSM_WIDE_REDUCE=1 (suffix-scan bucket reduction — a measured
    TPU negative kept behind a flag) must stay bit-identical."""
    rng = np.random.default_rng(11)
    n = 32
    g = G1.generator()
    points = [g * (int(rng.integers(1, 1 << 62))) for _ in range(n)]
    scalars = _rand_scalars(rng, n)
    coords = [np.asarray(x) for x in W.encode_g1_points(points)]
    digits = M.scalars_to_digits(scalars, 4, 256)
    packed = MS.pack_points(tuple(coords))
    old = MS.WIDE_REDUCE
    try:
        MS.WIDE_REDUCE = True
        out = MS.sorted_msm(W.G1Ops, packed, digits, 4)
    finally:
        MS.WIDE_REDUCE = old
    got = W.decode_g1_points(*(np.asarray(x)[None] for x in out))[0]
    assert got == _host_msm(points, scalars)


@pytest.mark.parametrize("c", [5])
def test_bgmw_msm_matches_host(c):
    """BGMW fixed-base tables (device-built doubling slabs + batched
    affinization) + merged single-window MSMs over power-of-two window
    groups must agree with the host MSM (c=5 exercises the [32,16,2,1]
    non-trivial group split; the c=4 single-group variant was dropped to
    halve this test's ~460 s of CPU compile — round-5 measured the BGMW
    path a perf NEGATIVE at every c on v5e, so it stays flag-off
    correctness-only coverage)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    n = 16
    g = G1.generator()
    points = [g * (int(rng.integers(1, 1 << 62))) for _ in range(n - 1)]
    points.append(G1.identity())  # identity slab entries stay identity
    scalars = _rand_scalars(rng, n)
    scalars[2] = 0
    coords = [np.asarray(x) for x in W.encode_g1_points(points)]
    packed = jnp.asarray(MS.pack_points(tuple(coords)))
    limbs = np.zeros((n, 16), dtype=np.uint16)
    for i, s in enumerate(scalars):
        for j in range(16):
            limbs[i, j] = (s >> (16 * j)) & 0xFFFF
    table = MS.build_bgmw_table(W.G1Ops, packed, c)
    assert table.shape[0] == MS.n_windows_for(c) * n
    out = MS.bgmw_msm_from_limbs(W.G1Ops, table, jnp.asarray(limbs), c)
    got = W.decode_g1_points(*(np.asarray(x)[None] for x in out))[0]
    assert got == _host_msm(points, scalars)


def test_sorted_msm_matches_pippenger():
    rng = np.random.default_rng(7)
    n = 128
    g = G1.generator()
    points = [g * int(rng.integers(1, 1 << 62)) for _ in range(n)]
    scalars = _rand_scalars(rng, n)
    coords = [np.asarray(x) for x in W.encode_g1_points(points)]
    digits = M.scalars_to_digits(scalars, 8, 256)
    srt = MS.sorted_msm(W.G1Ops, MS.pack_points(tuple(coords)), digits, 8)
    import jax.numpy as jnp

    pip = M.pippenger_msm(W.G1Ops, tuple(coords), jnp.asarray(digits), c=8, lanes=4)
    a = W.decode_g1_points(*(np.asarray(x)[None] for x in srt))[0]
    b = W.decode_g1_points(*(np.asarray(x)[None] for x in pip))[0]
    assert a == b


def _limbs16(scalars):
    out = np.zeros((len(scalars), 16), dtype=np.uint32)
    for i, s in enumerate(scalars):
        for j in range(16):
            out[i, j] = (s >> (16 * j)) & 0xFFFF
    return out


@pytest.mark.parametrize("c", [2, 5, 8, 11, 16])
@pytest.mark.parametrize("signed", [False, True])
def test_windows_from_limbs_exact(c, signed):
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    scalars = _rand_scalars(rng, 32)
    scalars[0] = 0
    scalars[1] = R - 1
    scalars[2] = 1
    d = np.asarray(
        MS.windows_from_limbs(jnp.asarray(_limbs16(scalars)), c, signed=signed)
    )
    W_ = MS.n_windows_for(c, signed)
    assert d.shape == (32, W_)
    if signed:
        half = 1 << (c - 1)
        assert d.min() >= -half and d.max() <= half
    for i, s in enumerate(scalars):
        assert sum(int(d[i, w]) << (c * w) for w in range(W_)) == s


@pytest.mark.parametrize("c", [4, 8])
def test_sorted_msm_from_limbs_signed_g1(c):
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    n = 64
    g = G1.generator()
    points = [g * int(rng.integers(1, 1 << 62)) for _ in range(n)]
    points[7] = G1.identity()
    scalars = _rand_scalars(rng, n)
    scalars[3] = 0
    coords = [np.asarray(x) for x in W.encode_g1_points(points)]
    packed = MS.pack_points(tuple(coords))
    out = MS.sorted_msm_from_limbs(
        W.G1Ops, packed, jnp.asarray(_limbs16(scalars)), c, signed=True
    )
    got = W.decode_g1_points(*(np.asarray(x)[None] for x in out))[0]
    assert got == _host_msm(points, scalars)


def test_sorted_msm_from_limbs_signed_g2():
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    n = 16
    g = G2.generator()
    points = [g * int(rng.integers(1, 1 << 62)) for _ in range(n)]
    scalars = _rand_scalars(rng, n)
    coords = [np.asarray(x) for x in W.encode_g2_points(points)]
    packed = MS.pack_points(tuple(coords))
    out = MS.sorted_msm_from_limbs(
        W.G2Ops, packed, jnp.asarray(_limbs16(scalars)), 8, signed=True
    )
    got = W.decode_g2_points(*(np.asarray(x)[None] for x in out))[0]
    assert got == _host_msm(points, scalars)


def test_masked_sum_g1():
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    n = 32
    g = G1.generator()
    points = [g * int(rng.integers(1, 1 << 62)) for _ in range(n)]
    points[5] = G1.identity()
    bits = rng.integers(0, 2, n).astype(np.int32)
    bits[0] = 1
    bits[1] = 0
    coords = [np.asarray(x) for x in W.encode_g1_points(points)]
    packed = MS.pack_points(tuple(coords))
    out = MS.masked_sum(W.G1Ops, packed, jnp.asarray(bits))
    got = W.decode_g1_points(*(np.asarray(x)[None] for x in out))[0]
    assert got == _host_msm(points, [int(b) for b in bits])


def test_sorted_msm_g2():
    rng = np.random.default_rng(9)
    n = 32
    g = G2.generator()
    points = [g * int(rng.integers(1, 1 << 62)) for _ in range(n)]
    scalars = _rand_scalars(rng, n)
    scalars[0] = 0
    coords = [np.asarray(x) for x in W.encode_g2_points(points)]
    digits = M.scalars_to_digits(scalars, 8, 256)
    out = MS.sorted_msm(W.G2Ops, MS.pack_points(tuple(coords)), digits, 8)
    got = W.decode_g2_points(*(np.asarray(x)[None] for x in out))[0]
    assert got == _host_msm(points, scalars)


def test_sorted_msm_legacy_scan_path():
    """The pre-round-5 scan-over-windows path (MASP_MSM_AFFINE=0) must
    stay bit-identical — it is the fallback for non-affine-encoded rows."""
    rng = np.random.default_rng(31)
    n = 32
    g = G1.generator()
    points = [g * int(rng.integers(1, 1 << 62)) for _ in range(n)]
    scalars = _rand_scalars(rng, n)
    coords = [np.asarray(x) for x in W.encode_g1_points(points)]
    digits = M.scalars_to_digits(scalars, 4, 256)
    packed = MS.pack_points(tuple(coords))
    old = MS.AFFINE_LADDER
    try:
        MS.AFFINE_LADDER = False
        out = MS.sorted_msm(W.G1Ops, packed, digits, 4)
    finally:
        MS.AFFINE_LADDER = old
    got = W.decode_g1_points(*(np.asarray(x)[None] for x in out))[0]
    assert got == _host_msm(points, scalars)


@pytest.mark.parametrize("grp", ["g1", "g2"])
def test_affine_ladder_adversarial(grp):
    """Batch-affine ladder edge lanes: duplicated points meeting in the
    tree (tangent/doubling), P and -P meeting (chord-infinity), identity
    pads interleaved, zero scalars. Adjacency is forced by giving the
    special pairs identical scalars (the sort is stable, so equal digits
    keep index order and original neighbors stay neighbors)."""
    rng = np.random.default_rng(37)
    n = 32
    if grp == "g1":
        G, enc, dec, fops = G1, W.encode_g1_points, W.decode_g1_points, W.G1Ops
    else:
        G, enc, dec, fops = G2, W.encode_g2_points, W.decode_g2_points, W.G2Ops
    g = G.generator()
    points = [g * int(rng.integers(1, 1 << 62)) for _ in range(n)]
    points[1] = points[0]            # doubling lanes at the leaf level
    points[3] = -points[2]           # P + (-P) -> identity lanes
    points[5] = G.identity()
    points[6] = G.identity()         # identity + identity
    points[8] = G.identity()         # identity + finite pass-through
    scalars = _rand_scalars(rng, n)
    scalars[1] = scalars[0]
    scalars[3] = scalars[2]
    scalars[6] = scalars[5]
    scalars[10] = 0
    coords = [np.asarray(x) for x in enc(points)]
    digits = M.scalars_to_digits(scalars, 4, 256)
    packed = MS.pack_points(tuple(coords))
    old_lvl, old_on = MS.AFFINE_LEVELS, MS.AFFINE_LADDER
    try:
        MS.AFFINE_LADDER = True
        MS.AFFINE_LEVELS = 16  # force every level affine (clamped to depth)
        out = MS.sorted_msm(fops, packed, digits, 4)
    finally:
        MS.AFFINE_LEVELS, MS.AFFINE_LADDER = old_lvl, old_on
    got = dec(*(np.asarray(x)[None] for x in out))[0]
    assert got == _host_msm(points, scalars)

def test_klay_affine_level_unit_interpret():
    """klay_affine_level (fused pallas pre/tree/post kernels, interpret
    mode off-TPU) vs the pure-jax _affine_level reference on one level of
    1024 lanes, covering chord/doubling/P+(-P)/identity lanes. The whole-
    MSM klay path is exercised on real TPU (tools/exp_affine_bench.py and
    the prover benches); a full-MSM interpret run takes hours on CPU."""
    import jax.numpy as jnp

    from masp_tpu.kernels import field_kernels as FK
    from masp_tpu.ops import field_jax as F

    rng = np.random.default_rng(47)
    n = 1024
    g = G1.generator()
    base = [g * int(rng.integers(1, 1 << 62)) for _ in range(40)]
    p1, p2 = [], []
    for i in range(n):
        a = base[i % 40]
        b = base[(i * 7 + 3) % 40]
        if i % 11 == 0:
            b = a          # doubling lane
        if i % 13 == 0:
            b = -a         # P + (-P) lane
        if i % 17 == 0:
            a = G1.identity()
        if i % 19 == 0:
            b = G1.identity()
        p1.append(a)
        p2.append(b)

    def enc(points):
        X, Y, Z = W.encode_g1_points(points)
        f = (np.asarray(Z) == 0).all(axis=1).astype(np.int32)
        return jnp.asarray(X), jnp.asarray(Y), jnp.asarray(f)

    x1, y1, f1 = enc(p1)
    x2, y2, f2 = enc(p2)
    old_impl = F.get_impl()
    try:
        F.set_impl("pallas")  # off-TPU -> interpret mode
        kx1 = FK.to_kernel_layout(x1, FK.TB)[0]
        ky1 = FK.to_kernel_layout(y1, FK.TB)[0]
        kx2 = FK.to_kernel_layout(x2, FK.TB)[0]
        ky2 = FK.to_kernel_layout(y2, FK.TB)[0]
        kf1 = f1.astype(jnp.uint32).reshape(-1, FK.LANE)
        kf2 = f2.astype(jnp.uint32).reshape(-1, FK.LANE)
        kx, ky, kf = FK.klay_affine_level(kx1, ky1, kf1, kx2, ky2, kf2)
        gx = np.asarray(FK.from_kernel_layout(kx, n, (24,)))
        gy = np.asarray(FK.from_kernel_layout(ky, n, (24,)))
        gf = np.asarray(kf.reshape(-1))
    finally:
        F.set_impl(old_impl)

    # pure-jax reference (compact impl)
    rx, ry, rf = MS._affine_level(W.G1Ops, (x1, y1, f1), (x2, y2, f2))
    assert (np.asarray(rf) != 0).tolist() == (gf != 0).tolist()
    live = gf == 0
    assert (gx[live] == np.asarray(rx)[live]).all()
    assert (gy[live] == np.asarray(ry)[live]).all()
    # and vs the host group law on a few lanes
    for i in list(range(0, 64, 7)):
        want = p1[i] + p2[i]
        if want.is_identity():
            assert gf[i] != 0
        else:
            import masp_tpu.ops.field_jax as FJ
            got_x = FJ.decode(FJ.FQ, gx[i][None])[0]
            got_y = FJ.decode(FJ.FQ, gy[i][None])[0]
            assert (got_x, got_y) == (want.x.n, want.y.n)

"""prepare_device_params layout: per-query power-of-two padding and the
host rows cache (the .rows-v2.npz sidecar written next to cached params).

The padding rule mirrors bellperson's density-filtered multiexp queries
(reference masp_proofs -> bellperson create_proof; SURVEY.md §3.1): each
of h/l/a/b_g1 is an independent MSM, so each may pad to its own power of
two once sizes are production-scale, while small test params keep one
shared pad (single compiled MSM program on CPU).
"""

import numpy as np
import pytest

from masp_tpu.curves.bls12_381 import G1, G2
from masp_tpu.groth16 import prover as PR
from masp_tpu.groth16.structures import Parameters, VerifyingKey


def _rand_params(rng, n_h, n_l, n_a, n_b):
    g1 = lambda: G1.generator() * int(rng.integers(1, 1 << 40))
    g2 = lambda: G2.generator() * int(rng.integers(1, 1 << 40))
    vk = VerifyingKey(
        alpha_g1=g1(), beta_g1=g1(), beta_g2=g2(), gamma_g2=g2(),
        delta_g1=g1(), delta_g2=g2(), ic=[g1() for _ in range(2)],
    )
    return Parameters(
        vk=vk,
        h=[g1() for _ in range(n_h)],
        l=[g1() for _ in range(n_l)],
        a=[g1() for _ in range(n_a)],
        b_g1=[g1() for _ in range(n_b)],
        b_g2=[g2() for _ in range(n_b)],
    )


@pytest.mark.skipif(PR.MSM_IMPL != "sorted", reason="sorted-layout test")
def test_small_params_share_one_pad():
    rng = np.random.default_rng(3)
    params = _rand_params(rng, n_h=63, n_l=40, n_a=33, n_b=17)
    PR.prepare_device_params(params)
    # below the production threshold every G1 query shares one pad
    for name in ("h", "l", "a", "b_g1"):
        assert params.device[name].shape[0] == 64
    assert params.device["b_g2"].shape[0] == 32  # G2 pads independently


@pytest.mark.skipif(PR.MSM_IMPL != "sorted", reason="sorted-layout test")
def test_rows_cache_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    params = _rand_params(rng, n_h=31, n_l=16, n_a=12, n_b=9)
    params.rows_cache = str(tmp_path / "rows.npz")
    PR.prepare_device_params(params)
    first = {k: np.asarray(params.device[k]) for k in ("h", "l", "a", "b_g1", "b_g2")}
    assert (tmp_path / "rows.npz").exists()

    # a second Parameters with DIFFERENT points but the same cache path must
    # load the cached rows (cache is keyed externally by the params digest)
    params2 = _rand_params(rng, n_h=31, n_l=16, n_a=12, n_b=9)
    params2.rows_cache = str(tmp_path / "rows.npz")
    PR.prepare_device_params(params2)
    for k, v in first.items():
        assert np.array_equal(np.asarray(params2.device[k]), v)

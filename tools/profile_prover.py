#!/usr/bin/env python
"""TPU profile: per-stage device timing of the Spend (or other) prove.

Times, in isolation with block_until_ready: the h quotient pipeline, the
h-scalar preparation, each of the five MSM dispatches at its real padded
size, and the result fetch/decode — so BENCH.md's "where the time goes"
is measured, not inferred. Reference hot path: bellman create_random_proof
(SURVEY.md §3.1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from masp_tpu.ops import field_jax as F

    F.set_impl("pallas" if jax.default_backend() == "tpu" else "compact")
    print("backend:", jax.default_backend(), flush=True)

    import numpy as np

    from masp_tpu.circuits.sapling import Output, Spend
    from masp_tpu.groth16 import prover as PR
    from masp_tpu.groth16.domain import Domain
    from masp_tpu.groth16.params_io import cached_test_params
    from masp_tpu.utils.rng import XorShiftRng

    import bench as B

    kind = os.environ.get("MASP_BENCH_CIRCUIT", "spend")
    rng = XorShiftRng.from_seed(bytes(range(16)))
    if kind == "spend":
        make_circuit, _ = B._spend_fixture(rng)
        params = cached_test_params("spend-test", Spend, rng)
    else:
        make_circuit, _ = B._output_fixture(rng)
        params = cached_test_params("output-test", Output, rng)
    PR.prepare_device_params(params)

    cs = PR.synthesize_witness(make_circuit())
    m = 1 << (cs.num_constraints - 1).bit_length()
    dom = Domain(m)
    print(f"m=2^{m.bit_length()-1}; query sizes:",
          {k: PR._dev_n(v) for k, v in params.device.items()
           if k in ("h", "l", "a", "b_g1", "b_g2")}, flush=True)

    def timeit(name, fn, iters=3):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn()
            jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        print(f"{name:28s} {dt*1e3:9.1f} ms", flush=True)
        return out, dt

    az, bz, cz = PR._compute_abc_limbs(cs, m)
    (h_coeffs, t_h) = timeit("h pipeline (7 NTTs)", lambda: PR._compute_h_coeffs(dom, az, bz, cz))
    n_g1 = PR._dev_n(params.device["h"])
    (h_in, t_hs) = timeit("h scalar prep", lambda: PR._h_scalar_input(h_coeffs, m, n_g1))

    dens = PR._densities(cs)
    full_u64 = PR._assignment_u64(cs)
    aux_u64 = full_u64[cs.num_inputs:]
    a_u64 = full_u64[dens[0]]
    b_u64 = full_u64[dens[1]]

    PR.prepare_split_queries(params, cs)
    split_on = params.device.get("l_small") is not None
    print("boolean split active:", split_on, flush=True)

    total = t_h + t_hs
    (_, dt) = timeit("msm h", lambda: PR._msm_g1_async(params.device["h"], h_in))
    total += dt
    for name, arr in (
        ("msm l (aux)", aux_u64),
        ("msm a", a_u64),
        ("msm b_g1", b_u64),
        ("msm b_g2", b_u64),
    ):
        qname = name.split()[1]
        (hs, dt) = timeit(name, lambda q=qname, a=arr: PR._msm_query_async(params, q, a))
        total += dt
        if split_on and f"{qname}_small" in params.device:
            qm = params.device[f"{qname}_qmask"]
            small = arr[qm]
            g2 = qname == "b_g2"
            n_sp = PR._dev_n(params.device[f"{qname}_small"])
            bits = np.zeros((n_sp, 1), dtype=np.int32)
            bits[: small.shape[0], 0] = small[:, 0].astype(np.int32)
            import jax.numpy as jnp

            jb = jnp.asarray(bits)
            timeit(f"  {qname} bits ({n_sp})",
                   lambda: PR._msm_bits_async(params.device[f"{qname}_small"], jb, g2))
            full = arr[~qm]
            nf = PR._dev_n(params.device[f"{qname}_full"])
            fin = PR._scalar_input(full, nf)
            one_async = PR._msm_g2_async if g2 else PR._msm_g1_async
            timeit(f"  {qname} full ({nf})",
                   lambda: one_async(params.device[f"{qname}_full"], fin))
    print(f"{'sum of stages':28s} {total*1e3:9.1f} ms", flush=True)

    # whole device stream end-to-end for comparison
    def full():
        return PR.create_proof_from_assembly(cs, params, 11, 22)

    t0 = time.time()
    full()
    print(f"{'full prove (incl host)':28s} {(time.time()-t0)*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()

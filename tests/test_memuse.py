"""Memory accounting (utils/memuse.py) — the memuse::DynamicUsage analogue
(reference note_encryption.rs:38-46, components/sapling.rs:321-328)."""

import numpy as np

from masp_tpu.utils.memuse import device_usage, dynamic_usage, dynamic_usage_bounds


def test_plain_values_cost_zero():
    assert dynamic_usage(7) == 0
    assert dynamic_usage(None) == 0
    assert dynamic_usage(True) == 0


def test_bytes_and_containers():
    assert dynamic_usage(b"\x00" * 192) == 192  # a Groth proof blob
    assert dynamic_usage([b"x" * 10, b"y" * 20]) == 8 * 2 + 30
    lo, hi = dynamic_usage_bounds({b"k": b"v" * 4})
    assert lo == hi == 16 + 1 + 4


def test_output_description_usage_is_proof_usage():
    # components/sapling.rs:321-328: an OutputDescription's dynamic usage
    # is dominated by its proof + ciphertext allocations
    from masp_tpu.transaction.components.sapling import OutputDescription

    od = OutputDescription(
        cv=b"\x01" * 32, cmu=b"\x02" * 32, ephemeral_key=b"\x03" * 32,
        enc_ciphertext=b"\x04" * 612, out_ciphertext=b"\x05" * 80,
        zkproof=b"\x06" * 192,
    )
    usage = dynamic_usage(od)
    assert usage >= 192 + 612 + 80  # proof + ciphertexts at minimum


def test_device_usage_counts_unique_buffers():
    import jax
    import jax.numpy as jnp

    a = jnp.zeros((16, 8), dtype=jnp.uint32)
    b = jnp.ones((4,), dtype=jnp.uint32)
    assert device_usage(a) == a.nbytes
    # shared buffer counted once; nesting flattened
    assert device_usage({"x": a, "y": [a, b]}) == a.nbytes + b.nbytes


def test_device_usage_on_prover_params_shape():
    import jax.numpy as jnp

    class FakeParams:
        device = {"h": jnp.zeros((8, 72), dtype=jnp.uint32), "n_g1": 8}

    assert device_usage(FakeParams()) == 8 * 72 * 4

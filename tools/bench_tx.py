#!/usr/bin/env python
"""Full multi-asset transaction benchmark (BASELINE.json config #4):
Spend + Convert + 2 Outputs, real Groth16 proving via LocalTxProver,
binding signature, then BatchValidator verification.

Uses the digest-keyed cached test parameters (generated on first use —
run bench.py for each circuit first to pay that cost separately).
Prints one JSON line for build+prove and one for batch validation.

Env: MASP_TX_ITERS (default 3).
"""

import json
import os
import sys
import time


def main():
    import jax

    from masp_tpu.ops import field_jax as F

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    F.set_impl("pallas" if on_tpu else "compact")

    from masp_tpu.circuits.convert import Convert
    from masp_tpu.circuits.sapling import Output, Spend
    from masp_tpu.groth16.local_prover import LocalTxProver
    from masp_tpu.groth16.params_io import cached_test_params
    from masp_tpu.groth16.sapling_prover import BatchValidator
    from masp_tpu.primitives.asset_type import AssetType
    from masp_tpu.primitives.consensus import TEST_NETWORK
    from masp_tpu.primitives.convert import AllowedConversion
    from masp_tpu.primitives.memo import MemoBytes
    from masp_tpu.primitives.merkle_tree import CommitmentTree, IncrementalWitness
    from masp_tpu.primitives.sapling import Rseed
    from masp_tpu.primitives.zip32 import ExtendedSpendingKey, PseudoExtendedKey
    from masp_tpu.transaction.amount import I128, U64, ValueSum
    from masp_tpu.transaction.builder import Builder
    from masp_tpu.transaction.components.sapling_builder import RngBuildParams
    from masp_tpu.transaction.fees import FixedFeeRule
    from masp_tpu.transaction.sighash import SignableInput, signature_hash
    from masp_tpu.transaction.txid import TxIdDigester
    from masp_tpu.utils.rng import XorShiftRng

    iters = int(os.environ.get("MASP_TX_ITERS", "3"))
    rng = XorShiftRng.from_seed(bytes(range(16)))

    prover = LocalTxProver(
        spend_params=cached_test_params("spend-test", Spend, rng),
        output_params=cached_test_params("output-test", Output, rng),
        convert_params=cached_test_params("convert-test", Convert, rng),
    )

    xsk = ExtendedSpendingKey.master(b"bench tx wallet")
    _idx, addr = xsk.default_address()
    asset_a = AssetType.new(b"bench-asset-A")
    asset_b = AssetType.new(b"bench-asset-B")
    note = addr.create_note(asset_a, 10_000, Rseed.after_zip212(rng.fill_bytes(32)))
    tree = CommitmentTree.empty()
    tree.append(note.commitment())
    witness = IncrementalWitness.from_tree(tree)
    allowed = AllowedConversion.from_assets(
        ValueSum.from_pair(asset_a, -1, I128) + ValueSum.from_pair(asset_b, 2, I128)
    )
    ctree = CommitmentTree.empty()
    ctree.append(allowed.commitment())
    cwitness = IncrementalWitness.from_tree(ctree)
    fee = ValueSum.from_pair(asset_a, 1_000, U64)

    def build_tx():
        builder = Builder(TEST_NETWORK, 10)
        builder.add_sapling_spend(
            PseudoExtendedKey.from_spending_key(xsk), addr.diversifier, note,
            witness.path(),
        )
        builder.add_sapling_convert(allowed, 2_000, cwitness.path())
        builder.add_sapling_output(xsk.expsk.ovk, addr, asset_a, 7_000, MemoBytes.empty())
        builder.add_sapling_output(xsk.expsk.ovk, addr, asset_b, 4_000, MemoBytes.empty())
        tx, _meta = builder.build(
            prover, FixedFeeRule.non_standard(fee), rng, RngBuildParams(rng)
        )
        return tx

    from masp_tpu.utils import benchlog

    tx = build_tx()  # warmup (compiles)
    samples = []
    for _ in range(iters):
        t0 = time.time()
        tx = build_tx()
        samples.append(time.time() - t0)
    dt = sorted(samples)[len(samples) // 2]
    benchlog.emit({
        "metric": "full tx build+prove (1 spend, 1 convert, 2 outputs)",
        "value": round(dt, 3),
        "unit": "s/tx",
    }, samples)

    txid_parts = tx.data.digest(TxIdDigester())
    sighash = signature_hash(tx.data, SignableInput.shielded(), txid_parts)

    def validate():
        v = BatchValidator()
        assert v.check_bundle(tx.sapling_bundle, sighash)
        return v.validate(prover.spend_vk, prover.convert_vk, prover.output_vk,
                          rng=rng)

    assert validate()  # warmup
    samples = []
    for _ in range(iters):
        t0 = time.time()
        assert validate()
        samples.append(time.time() - t0)
    dt = sorted(samples)[len(samples) // 2]
    benchlog.emit({
        "metric": "full tx batch-validate (4 proofs + 2 sig batches)",
        "value": round(dt * 1000, 1),
        "unit": "ms/tx",
    }, samples)


if __name__ == "__main__":
    sys.exit(main())

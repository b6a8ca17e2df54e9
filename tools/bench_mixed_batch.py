#!/usr/bin/env python
"""Mixed 64-proof batch benchmark — a step toward BASELINE.json config #5
(1k mixed proofs, pod-parallel).

ONE transaction bundle with 8 spends + 8 converts + 48 outputs (64 proofs)
is built through the two-phase SaplingBuilder, proved via
LocalTxProver.prove_jobs (one pipelined device stream per circuit kind),
then verified end-to-end with ONE BatchValidator.validate (randomized
Groth16 batch per kind + two RedJubjub signature batches). Reference
analogue: proof-level rayon parallelism, masp_proofs/src/sapling/
prover.rs:51-275 and batch validation batch.rs:15-239.

Prints one JSON line for prove and one for validate.
Env: MASP_MIXED_ITERS (default 2).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    iters = int(os.environ.get("MASP_MIXED_ITERS", "2"))
    n_spends, n_converts = 8, 8
    rng = XorShiftRng.from_seed(bytes(range(16)))

    prover = LocalTxProver(
        spend_params=cached_test_params("spend-test", Spend, rng),
        output_params=cached_test_params("output-test", Output, rng),
        convert_params=cached_test_params("convert-test", Convert, rng),
    )

    xsk = ExtendedSpendingKey.master(b"mixed batch wallet")
    _idx, addr = xsk.default_address()
    asset_a = AssetType.new(b"mixed-asset-A")
    asset_b = AssetType.new(b"mixed-asset-B")

    # 8 notes of asset A in one tree, each witness tracking later appends
    tree = CommitmentTree.empty()
    notes, witnesses = [], []
    for _i in range(n_spends):
        note = addr.create_note(asset_a, 10_000, Rseed.after_zip212(rng.fill_bytes(32)))
        tree.append(note.commitment())
        for w in witnesses:
            w.append(note.commitment())
        notes.append(note)
        witnesses.append(IncrementalWitness.from_tree(tree))

    allowed = AllowedConversion.from_assets(
        ValueSum.from_pair(asset_a, -1, I128) + ValueSum.from_pair(asset_b, 2, I128)
    )
    ctree = CommitmentTree.empty()
    ctree.append(allowed.commitment())
    cwitness = IncrementalWitness.from_tree(ctree)

    fee = ValueSum.from_pair(asset_a, 1_000, U64)

    # balance: +80,000 A from spends, converts burn 16,000 A / mint
    # 32,000 B, fee 1,000 A -> outputs 63,000 A + 32,000 B over 48 notes
    out_plan = [(asset_a, 2_000)] * 31 + [(asset_a, 1_000)]
    out_plan += [(asset_b, 2_000)] * 16
    assert len(out_plan) == 48

    def build_tx():
        builder = Builder(TEST_NETWORK, 10)
        for note, w in zip(notes, witnesses):
            builder.add_sapling_spend(
                PseudoExtendedKey.from_spending_key(xsk), addr.diversifier,
                note, w.path(),
            )
        for _ in range(n_converts):
            builder.add_sapling_convert(allowed, 2_000, cwitness.path())
        for asset, value in out_plan:
            builder.add_sapling_output(
                xsk.expsk.ovk, addr, asset, value, MemoBytes.empty()
            )
        tx, _meta = builder.build(
            prover, FixedFeeRule.non_standard(fee), rng, RngBuildParams(rng)
        )
        return tx

    n_proofs = n_spends + n_converts + len(out_plan)
    from masp_tpu.utils import benchlog

    tx = build_tx()  # warmup (compiles)
    samples = []
    for _ in range(iters):
        t0 = time.time()
        tx = build_tx()
        samples.append(time.time() - t0)
    dt = sorted(samples)[len(samples) // 2]
    benchlog.emit({
        "metric": f"mixed batch build+prove ({n_spends} spend, {n_converts} "
                  f"convert, {len(out_plan)} output = {n_proofs} proofs)",
        "value": round(dt, 3),
        "unit": "s/batch",
        "s_per_proof": round(dt / n_proofs, 4),
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
        "metric": f"mixed batch validate ({n_proofs} proofs + sig batches)",
        "value": round(dt, 3),
        "unit": "s/batch",
        "ms_per_proof": round(dt * 1000 / n_proofs, 1),
    }, samples)


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""End-to-end shielded transaction walkthrough.

The full user journey a masp (reference) user follows, on masp_tpu:
derive keys (ZIP-32), fund a note, build a shielded transaction
(spend -> output + fee), prove it, apply signatures, serialize to the
MASPv5 wire format, re-parse, and batch-validate.

Uses MockTxProver (zeroed proofs, real value commitments and binding
signature) so it runs in seconds anywhere; swap in
masp_tpu.groth16.local_prover.LocalTxProver with real parameters for
actual proofs — the builder code path is identical (reference:
masp_proofs/src/prover.rs LocalTxProver vs masp_primitives
sapling/prover.rs MockTxProver).

Run:  python tools/examples/end_to_end_tx.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

# This demo needs no accelerator (MockTxProver): run the handful of jax
# touches on CPU so it works even when the TPU relay is unavailable.
# Must happen before any jax array op; opt out with MASP_EXAMPLE_TPU=1.
if os.environ.get("MASP_EXAMPLE_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from masp_tpu.primitives.asset_type import AssetType
from masp_tpu.primitives.consensus import TEST_NETWORK
from masp_tpu.primitives.memo import MemoBytes
from masp_tpu.primitives.merkle_tree import CommitmentTree, IncrementalWitness
from masp_tpu.primitives.sapling import Rseed
from masp_tpu.primitives.zip32 import ExtendedSpendingKey, PseudoExtendedKey
from masp_tpu.transaction.amount import U64, ValueSum
from masp_tpu.transaction.builder import Builder
from masp_tpu.transaction.components.sapling_builder import RngBuildParams
from masp_tpu.transaction.fees import FixedFeeRule
from masp_tpu.transaction.transaction import Transaction
from masp_tpu.transaction.tx_prover import MockTxProver
from masp_tpu.utils.rng import XorShiftRng


def main():
    rng = XorShiftRng.from_seed(bytes(range(16)))
    height = 10  # MASP active; ZIP-212 rseed rules

    # 1. keys: ZIP-32 master -> default payment address
    xsk = ExtendedSpendingKey.master(b"demo wallet seed")
    _div_idx, addr = xsk.default_address()
    print(f"payment address: d={addr.diversifier.d.hex()} "
          f"pk_d={addr.pk_d.to_bytes().hex()[:16]}…")

    # 2. fund: a 100_000-unit note of a custom asset, noted in the tree
    asset = AssetType.new(b"demo-asset")
    note = addr.create_note(asset, 100_000, Rseed.after_zip212(rng.fill_bytes(32)))
    tree = CommitmentTree.empty()
    tree.append(note.commitment())
    witness = IncrementalWitness.from_tree(tree)
    print(f"asset id: {asset.identifier.hex()[:16]}…  note cmu: "
          f"{hex(note.cmu().n)[:18]}…")

    # 3. build: spend the note, send 99_000 back, leave 1_000 as fee
    builder = Builder(TEST_NETWORK, height)
    builder.add_sapling_spend(
        PseudoExtendedKey.from_spending_key(xsk), addr.diversifier, note,
        witness.path(),
    )
    builder.add_sapling_output(
        xsk.expsk.ovk, addr, asset, 99_000, MemoBytes.empty()
    )
    fee = ValueSum.from_pair(asset, 1_000, U64)
    prover = MockTxProver(real_binding_sig=True)
    tx, _meta = builder.build(
        prover, FixedFeeRule.non_standard(fee), rng, RngBuildParams(rng)
    )
    bundle = tx.sapling_bundle
    print(f"built: {len(bundle.shielded_spends)} spend(s), "
          f"{len(bundle.shielded_outputs)} output(s) "
          f"(padded to >=2 with a dummy), value balance "
          f"{bundle.value_balance.get(asset)} (the fee)")

    # 4. wire format: serialize, re-parse, txid stability
    raw = tx.to_bytes()
    tx2 = Transaction.from_bytes(raw)
    assert tx2.to_bytes() == raw
    assert tx2.txid() == tx.txid()
    print(f"MASPv5 bytes: {len(raw)}  txid: {tx.txid()}")

    # 5. validate signatures (proofs are mock-zeroed; with LocalTxProver
    #    the same BatchValidator path also batch-verifies the proofs)
    from masp_tpu.primitives.constants import spending_key_generator
    from masp_tpu.transaction.sighash import SignableInput, signature_hash
    from masp_tpu.transaction.txid import TxIdDigester

    txid_parts = tx.data.digest(TxIdDigester())
    sighash = signature_hash(tx.data, SignableInput.shielded(), txid_parts)
    ok_spend = all(
        s.rk.verify(
            s.rk.point.to_bytes() + sighash, s.spend_auth_sig,
            spending_key_generator(),
        )
        for s in bundle.shielded_spends
    )
    print(f"spend-auth signatures verify: {ok_spend}")
    assert ok_spend
    print("OK")


if __name__ == "__main__":
    main()

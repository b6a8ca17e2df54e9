"""Batched device Pedersen hash (ops/pedersen_jax.py) vs the exact host
implementation, including the Merkle level builder and the Frozen tree's
device path."""

import random

from masp_tpu.ops import pedersen_jax as PJ
from masp_tpu.primitives.pedersen import Personalization, pedersen_hash
from masp_tpu.primitives.sapling import merkle_hash


def test_batch_pedersen_matches_host():
    rng = random.Random(81)
    # one batch per length (chunk count is shape-static); cover segment
    # boundaries: <63 chunks, exactly 1 segment, 2 segments, 3 (merkle width)
    for nbits in (6, 183, 189, 254, 510):
        batch = [[rng.random() < 0.5 for _ in range(nbits)] for _ in range(5)]
        batch.append([False] * nbits)
        batch.append([True] * nbits)
        got = PJ.batch_pedersen_hash(Personalization.note_commitment(), batch)
        for g, bits in zip(got, batch):
            assert g == pedersen_hash(Personalization.note_commitment(), bits), nbits


def test_batch_pedersen_merkle_personalization():
    rng = random.Random(82)
    bits = [[rng.random() < 0.5 for _ in range(510)] for _ in range(3)]
    for depth in (0, 7, 31):
        got = PJ.batch_pedersen_hash(Personalization.merkle_tree(depth), bits)
        for g, bb in zip(got, bits):
            assert g == pedersen_hash(Personalization.merkle_tree(depth), bb)


def test_batch_merkle_hash_matches_host():
    rng = random.Random(83)
    pairs = [(rng.randrange(1 << 255).to_bytes(32, "little"),
              rng.randrange(1 << 255).to_bytes(32, "little")) for _ in range(6)]
    for depth in (0, 13):
        got = PJ.batch_merkle_hash(depth, pairs)
        want = [merkle_hash(depth, l, r) for (l, r) in pairs]
        assert got == want
    assert PJ.batch_merkle_hash(0, []) == []


def test_frozen_tree_device_levels_match_host(monkeypatch):
    from masp_tpu.primitives.merkle_tree import FrozenCommitmentTree
    from masp_tpu.primitives.sapling import Node

    rng = random.Random(84)
    leafs = [Node(rng.randrange(1 << 255).to_bytes(32, "little")) for _ in range(11)]
    monkeypatch.setenv("MASP_MERKLE_DEVICE_MIN", "0")
    host_tree = FrozenCommitmentTree.new(list(leafs))
    monkeypatch.setenv("MASP_MERKLE_DEVICE_MIN", "2")
    dev_tree = FrozenCommitmentTree.new(list(leafs))
    assert dev_tree == host_tree
    assert dev_tree.root() == host_tree.root()

"""Merkle tree and ValueSum tests (reference semantics)."""

import pytest

from masp_tpu.fields import Scalar
from masp_tpu.primitives.asset_type import AssetType
from masp_tpu.primitives.merkle_tree import (
    CommitmentTree, FrozenCommitmentTree, IncrementalWitness, MerklePath,
)
from masp_tpu.primitives.sapling import Node
from masp_tpu.transaction.amount import (
    I32, I64, I128, U64, BalanceError, ValueSum, default_fee,
)
from masp_tpu.utils.encoding import Reader, Writer

A1 = AssetType.new(b"asset one")
A2 = AssetType.new(b"asset two")
A3 = AssetType.new(b"asset three")


def _nodes(n):
    return [Node.from_scalar(Scalar(1000 + i)) for i in range(n)]


class TestValueSum:
    def test_zero_and_pairs(self):
        z = ValueSum.zero()
        assert z.is_zero()
        v = ValueSum.from_pair(A1, 5)
        assert v.get(A1) == 5 and v.get(A2) == 0
        assert ValueSum.from_pair(A1, 0).is_zero()

    def test_add_sub_cancel(self):
        v = ValueSum.from_pair(A1, 5) + ValueSum.from_pair(A2, 7)
        w = v - ValueSum.from_pair(A1, 5)
        assert w.get(A1) == 0 and w.get(A2) == 7
        assert (v - v).is_zero()
        assert (-v).get(A2) == -7

    def test_checked_bounds(self):
        big = ValueSum.from_pair(A1, 2**127 - 1, I128)
        with pytest.raises(BalanceError):
            _ = big + ValueSum.from_pair(A1, 1, I128)
        with pytest.raises(BalanceError):
            ValueSum.from_pair(A1, -1, U64)

    def test_inf_sup(self):
        a = ValueSum.from_pair(A1, 5) + ValueSum.from_pair(A2, 10)
        b = ValueSum.from_pair(A1, 7) + ValueSum.from_pair(A2, 2)
        assert a.inf(b).get(A1) == 5 and a.inf(b).get(A2) == 2
        assert a.sup(b).get(A1) == 7 and a.sup(b).get(A2) == 10

    def test_partial_order(self):
        a = ValueSum.from_pair(A1, 5)
        b = ValueSum.from_pair(A1, 7)
        c = ValueSum.from_pair(A2, 1)
        assert a <= b and not (b <= a)
        assert a.partial_cmp(c) is None

    def test_serialization_roundtrip(self):
        v = ValueSum.from_pair(A1, -5, I64) + ValueSum.from_pair(A2, 123456789, I64)
        data = v.to_bytes()
        got = ValueSum.read(Reader(data), I64)
        assert got == v

    def test_default_fee(self):
        f = default_fee()
        assert sum(v for _a, v in f.components()) == 1000

    def test_dot(self):
        prices = ValueSum.from_pair(A1, 3) + ValueSum.from_pair(A2, 4)
        qty = ValueSum.from_pair(A1, 10) + ValueSum.from_pair(A2, 100)
        assert prices.dot(qty) == 3 * 10 + 4 * 100


class TestMerkle:
    def test_frozen_vs_incremental_roots(self):
        leafs = _nodes(5)
        frozen = FrozenCommitmentTree.new(leafs)
        inc = CommitmentTree.empty()
        for leaf in leafs:
            inc.append(leaf)
        assert frozen.root() == inc.root()

    def test_frozen_paths(self):
        leafs = _nodes(7)
        frozen = FrozenCommitmentTree.new(leafs)
        root = frozen.root()
        for i, leaf in enumerate(leafs):
            path = frozen.path(i)
            assert path.position == i
            assert path.root(leaf) == root

    def test_frozen_merge(self):
        leafs = _nodes(11)
        whole = FrozenCommitmentTree.new(leafs)
        parts = [
            FrozenCommitmentTree.new(leafs[0:4]),
            FrozenCommitmentTree.new(leafs[4:8]),
            FrozenCommitmentTree.new(leafs[8:11]),
        ]
        merged = FrozenCommitmentTree.merge(parts)
        assert merged.root() == whole.root()
        assert merged.size() == 11
        for i, leaf in enumerate(leafs):
            assert merged.path(i).root(leaf) == whole.root()

    def test_incremental_witness(self):
        leafs = _nodes(6)
        tree = CommitmentTree.empty()
        tree.append(leafs[0])
        tree.append(leafs[1])
        witness = IncrementalWitness.from_tree(tree)
        assert witness.position() == 1
        assert witness.root() == tree.root()
        for leaf in leafs[2:]:
            tree.append(leaf)
            witness.append(leaf)
            assert witness.root() == tree.root()
        path = witness.path()
        assert path is not None
        assert path.root(leafs[1]) == tree.root()

    def test_empty_tree_root_is_empty_root(self):
        assert CommitmentTree.empty().root() == Node.empty_root(32)

    def test_commitment_tree_serialization(self):
        tree = CommitmentTree.empty()
        for leaf in _nodes(5):
            tree.append(leaf)
        w = Writer()
        tree.write(w)
        got = CommitmentTree.read(Reader(w.getvalue()))
        assert got == tree
        assert got.root() == tree.root()

    def test_merkle_path_serialization(self):
        leafs = _nodes(4)
        frozen = FrozenCommitmentTree.new(leafs)
        path = frozen.path(2)
        data = path.to_bytes()
        got = MerklePath.from_slice(data)
        assert got == path

    def test_witness_serialization(self):
        tree = CommitmentTree.empty()
        leafs = _nodes(5)
        tree.append(leafs[0])
        witness = IncrementalWitness.from_tree(tree)
        for leaf in leafs[1:]:
            tree.append(leaf)
            witness.append(leaf)
        w = Writer()
        witness.write(w)
        got = IncrementalWitness.read(Reader(w.getvalue()))
        assert got.root() == witness.root()
        assert got.path().root(leafs[0]) == witness.path().root(leafs[0])

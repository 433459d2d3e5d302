"""Canonical + length-limited (package-merge) code tests."""

import numpy as np
import pytest

from tpuhuff import ByteWeights, HuffTree, compress_with_tree, decompress
from tpuhuff.core.canonical import (
    build_tree_for_device,
    canonical_codes_from_lengths,
    canonicalize,
    length_limited_code_lengths,
    tree_from_code_lengths,
)


def _fib_weights(n):
    fib = [1, 1]
    for _ in range(n - 2):
        fib.append(fib[-1] + fib[-2])
    counts = np.zeros(256, dtype=np.int64)
    counts[:n] = fib
    return ByteWeights(counts)


def test_canonical_codes_basic():
    codes = canonical_codes_from_lengths([("a", 2), ("b", 1), ("c", 3), ("d", 3)])
    # canonical: b=0, a=10, c=110, d=111
    assert codes["b"] == (0b0, 1)
    assert codes["a"] == (0b10, 2)
    assert codes["c"] == (0b110, 3)
    assert codes["d"] == (0b111, 3)


def test_canonicalize_same_lengths_same_size():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 50, 10_000, dtype=np.uint8).tobytes()
    tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
    ctree = canonicalize(tree)
    lens = {k: c.length for k, c in tree.read_codes().items()}
    clens = {k: c.length for k, c in ctree.read_codes().items()}
    assert lens == clens
    a = compress_with_tree(data, tree)
    b = compress_with_tree(data, ctree)
    assert len(a.comp_bytes) == len(b.comp_bytes)
    assert decompress(b) == data  # different bits, same content


def test_canonical_tree_roundtrips_through_bin():
    tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(b"abracadabra")))
    rt = HuffTree.try_from_bin(tree.as_bin())
    assert rt.read_codes() == tree.read_codes()


def test_kraft_violation_rejected():
    with pytest.raises(ValueError, match="Kraft"):
        canonical_codes_from_lengths([("a", 1), ("b", 1), ("c", 1)])


def test_package_merge_unconstrained_matches_huffman():
    # with a generous limit, total cost equals Huffman's
    rng = np.random.default_rng(1)
    counts = np.zeros(256, dtype=np.int64)
    counts[:40] = rng.integers(1, 10_000, 40)
    bw = ByteWeights(counts)
    huff = HuffTree.from_weights(bw)
    hufflens = {k: c.length for k, c in huff.read_codes().items()}
    cost_h = sum(counts[k] * l for k, l in hufflens.items())
    ll = length_limited_code_lengths(bw, 32)
    cost_ll = sum(counts[k] * l for k, l in ll)
    assert cost_ll == cost_h


def test_package_merge_respects_limit():
    bw = _fib_weights(40)  # unconstrained depth 39
    for limit in (32, 16, 8):
        ll = length_limited_code_lengths(bw, limit)
        assert max(l for _, l in ll) <= limit
        # Kraft-valid (buildable)
        assert sum(2 ** -l for _, l in ll) <= 1.0 + 1e-12
        tree = tree_from_code_lengths(ll)
        assert tree.max_code_len() <= limit


def test_package_merge_cost_optimal_vs_bruteforce_small():
    # 5 symbols, limit 3: compare against brute force over all valid length
    # assignments
    import itertools

    weights = [13, 7, 5, 2, 1]
    bw = {chr(65 + i): w for i, w in enumerate(weights)}
    ll = length_limited_code_lengths(bw, 3)
    cost_pm = sum(dict(ll)[chr(65 + i)] * w for i, w in enumerate(weights))
    best = 10**9
    for lens in itertools.product(range(1, 4), repeat=5):
        if sum(2 ** -l for l in lens) <= 1.0:
            best = min(best, sum(l * w for l, w in zip(lens, weights)))
    assert cost_pm == best


def test_build_tree_for_device():
    # shallow tree: passes through the reference-exact tree
    bw = ByteWeights.from_bytes(b"aabbbcccc")
    tree, limited = build_tree_for_device(bw, 32)
    assert not limited
    assert tree.read_codes() == HuffTree.from_weights(bw).read_codes()
    # pathological: falls back to length-limited
    deep = _fib_weights(40)
    tree, limited = build_tree_for_device(deep, 32)
    assert limited and tree.max_code_len() <= 32
    # still encodes/decodes correctly
    rng = np.random.default_rng(2)
    data = rng.integers(0, 40, 5000, dtype=np.uint8).tobytes()
    comp = compress_with_tree(data, tree)
    assert decompress(comp) == data

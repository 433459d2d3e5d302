"""Tree construction + serde tests.

Golden values are the reference's pinned assertions: integration tests
(`huff_coding/tests/tree_init.rs`, `tree_bin.rs`) and doctests
(`tree_inner.rs:62-79`, `lib.rs:20-59`, `tree_inner.rs:620-628`).
"""

import numpy as np
import pytest

from tpuhuff import (
    BitString,
    ByteWeights,
    EmptyWeightsError,
    FromBinError,
    HuffTree,
)


def codes01(tree):
    return {k: c.to01() for k, c in tree.read_codes().items()}


# ---- reference tests/tree_init.rs ----------------------------------------
def test_tree_normal_init():
    # tree_init.rs:9-47 — exact codes for a 6-symbol weight map
    weights = {
        "Spazz": 5,
        "Maticus...": 9,
        "a young King": 12,
        "on a mad": 13,
        "quest": 16,
        "to rule the world.": 45,
    }
    c = codes01(HuffTree.from_weights(weights))
    assert c["Spazz"] == "1100"
    assert c["Maticus..."] == "1101"
    assert c["a young King"] == "100"
    assert c["on a mad"] == "101"
    assert c["quest"] == "111"
    assert c["to rule the world."] == "0"


def test_tree_single_branch():
    # tree_init.rs:50-64 — lone leaf is root with code "0"
    tree = HuffTree.from_weights({-12: 78})
    assert tree.is_leaf(tree.root)
    assert tree.letters[tree.root] == -12
    assert codes01(tree) == {-12: "0"}


def test_tree_invalid_weights():
    # tree_init.rs:67-69 — panics "provided empty weights"
    with pytest.raises(EmptyWeightsError, match="provided empty weights"):
        HuffTree.from_weights({})


# ---- reference doctests ---------------------------------------------------
def test_doctest_abbccc_codes():
    # tree_inner.rs:62-79: c=0, b=11, a=10
    c = codes01(HuffTree.from_weights(ByteWeights.from_bytes(b"abbccc")))
    assert c[ord("c")] == "0"
    assert c[ord("b")] == "11"
    assert c[ord("a")] == "10"


def test_doctest_hashmap_weights():
    # tree_inner.rs:88-107: insertion-seeded dict weights
    weights = {"pudzian": 1, "krol": 2, "szef": 3}
    c = codes01(HuffTree.from_weights(weights))
    assert c["szef"] == "0"
    assert c["krol"] == "11"
    assert c["pudzian"] == "10"


def test_doctest_lib_tree_bin():
    # lib.rs:20-55: bytes [0xff,0xff,0xff,0xaa,0xaa,0xcc] →
    # tree bin "[10111111, 11101100, 11000101, 01010]"
    data = bytes([0xFF, 0xFF, 0xFF, 0xAA, 0xAA, 0xCC])
    tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
    assert tree.as_bin().group_string() == "[10111111, 11101100, 11000101, 01010]"


def test_doctest_abbccc_tree_bin():
    # tree_inner.rs:620-628: b"abbccc" → "[10011000, 11100110, 00010011, 00010]"
    tree = HuffTree.from_weights(ByteWeights.from_bytes(b"abbccc"))
    assert tree.as_bin().group_string() == "[10011000, 11100110, 00010011, 00010]"
    # tree_inner.rs:109-120: second bit (index 1) is 0 (root's left is a leaf)
    assert tree.as_bin()[1] == 0


# ---- round-trips & errors (tests/tree_bin.rs) ------------------------------
MONGO = (
    b"Mongo...\n    a great barbarian from the north seeking to conquer new "
    b"lands for his kingdom.\n    Mysterio the Magnificent...\n    a powerful "
    b"wizard questing for the secret of immortality."
)


def test_tree_from_bin_roundtrip():
    # tree_bin.rs:7-14
    tree = HuffTree.from_weights(ByteWeights.from_bytes(MONGO))
    rt = HuffTree.try_from_bin(tree.as_bin())
    assert rt.read_codes() == tree.read_codes()
    # weights come back as 0 (tree_inner.rs:446-447)
    assert int(rt.weights[rt.root]) == 0
    assert int(tree.weights[tree.root]) == len(MONGO)


def test_tree_bin_invalid_type():
    # tree_bin.rs:18-26 — decoding a u8 tree as u128 fails
    tree = HuffTree.from_weights(ByteWeights.from_bytes(MONGO))
    with pytest.raises(FromBinError):
        HuffTree.try_from_bin(tree.as_bin(), "u128")


def test_tree_bin_invalid_vec():
    # tree_bin.rs:29-32 — empty bits fail
    with pytest.raises(FromBinError):
        HuffTree.try_from_bin(BitString())


def test_tree_bin_leftover_bits():
    # tree_inner.rs:586-590 — leftover bits are an error
    tree = HuffTree.from_weights(ByteWeights.from_bytes(b"abbccc"))
    bits = tree.as_bin()
    bits.push(1)
    with pytest.raises(FromBinError, match="too big"):
        HuffTree.try_from_bin(bits)


def test_tree_bin_size_formula():
    # SURVEY §2: u8 tree bin is exactly (2n-1) + 8n bits for n symbols
    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 17, 256):
        counts = np.zeros(256, dtype=np.int64)
        counts[rng.choice(256, size=n, replace=False)] = rng.integers(1, 1000, n)
        tree = HuffTree.from_weights(ByteWeights(counts))
        assert len(tree.as_bin()) == (2 * n - 1) + 8 * n


def test_non_u8_letter_widths():
    # letter.rs:57-60 — every integer width round-trips through the bin form
    for ltype, letters in [
        ("u16", [1000, 2000, 2000, 3000, 3000, 3000]),
        ("i32", [-5, -5, 7, 7, 7, 9]),
        ("u64", [2**40, 2**41, 2**41]),
        ("i128", [-(2**100), 2**99, 2**99]),
    ]:
        tree = HuffTree.from_weights({l: i + 1 for i, l in enumerate(dict.fromkeys(letters))})
        rt = HuffTree.try_from_bin(tree.as_bin(ltype), ltype)
        assert rt.read_codes() == tree.read_codes()


def test_max_code_len_and_tables():
    tree = HuffTree.from_weights(ByteWeights.from_bytes(b"abbccc"))
    assert tree.max_code_len() == 2
    lens, codes = tree.encode_tables()
    assert lens[ord("c")] == 1 and codes[ord("c")] == 0b0
    assert lens[ord("a")] == 2 and codes[ord("a")] == 0b10
    assert lens[ord("b")] == 2 and codes[ord("b")] == 0b11
    assert lens[ord("z")] == 0


def test_skewed_tree_depth():
    # fibonacci-ish weights force a 255-deep... use 40 symbols → depth 39
    n = 40
    fib = [1, 1]
    for _ in range(n - 2):
        fib.append(fib[-1] + fib[-2])
    counts = np.zeros(256, dtype=np.int64)
    counts[:n] = fib
    tree = HuffTree.from_weights(ByteWeights(counts))
    assert tree.max_code_len() == n - 1
    lens, _ = tree.encode_tables()
    assert int(lens.max()) == n - 1

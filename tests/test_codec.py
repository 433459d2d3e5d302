"""Block codec + container tests against the reference's golden doctests."""

import numpy as np
import pytest

from tpuhuff import (
    ByteWeights,
    CompressData,
    CompressError,
    CompressedDataFromBytesError,
    HuffTree,
    compress,
    compress_with_tree,
    decompress,
)

Q_RSQRT = b"""float Q_rsqrt( float number )
    {
        long i;
        float x2, y;
        const float threehalfs = 1.5F;

        x2 = number * 0.5F;
        y  = number;
        i  = * ( long * ) &y;                       // evil floating point bit level hacking
        i  = 0x5f3759df - ( i >> 1 );               // what the fuck?
        y  = * ( float * ) &i;
        y  = y * ( threehalfs - ( x2 * y * y ) );   // 1st iteration
    //	y  = y * ( threehalfs - ( x2 * y * y ) );   // 2nd iteration, this can be removed

        return y;
    }"""


def test_compress_decompress_qrsqrt():
    # huff_coding/tests/comp_decomp.rs:7-30
    comp = compress(Q_RSQRT)
    assert decompress(comp) == Q_RSQRT


def test_container_golden_bytes():
    # comp.rs:218-262 doctest: manual deconstruction of compress(b"abbccc")
    comp = compress(b"abbccc")
    raw = comp.to_bytes()
    assert raw[0] == 0x37  # 3 tree padding bits, 7 data padding bits
    assert int.from_bytes(raw[1:5], "big") == 4  # tree is 4 bytes
    assert raw[9] == 0b10111100
    assert raw[10] == 0b00000000
    assert len(raw) == 11


def test_container_roundtrip():
    # comp.rs:98-117 doctest
    comp = compress(b"abbccc")
    rt = CompressData.try_from_bytes(comp.to_bytes())
    assert decompress(rt) == b"abbccc"


def test_compress_with_tree_missing_letter():
    # comp.rs:396-415 doctest — letter b'c' not in tree built from b"abb"
    tree = HuffTree.from_weights(ByteWeights.from_bytes(b"abb"))
    with pytest.raises(CompressError, match="letter not found in codes"):
        compress_with_tree(b"abbccc", tree)


def test_compress_generic_letters():
    # comp.rs:326-346 doctest: nums / chars / strs
    nums = [-97, -98, -98, -99, -99, -99]
    chars = ["a", "b", "b", "c", "c", "c"]
    strs = ["ay", "bee", "bee", "cee", "cee", "cee"]
    for letters in (nums, chars, strs):
        comp = compress(letters)
        assert decompress(comp) == letters


def test_single_letter_stream():
    # degenerate tree: code "0", one letter per payload bit
    comp = compress(b"fffff")
    assert decompress(comp) == b"fffff"
    tree = comp.huff_tree
    assert tree.is_leaf(tree.root)
    # 5 bits → 1 byte, 3 padding bits
    assert len(comp.comp_bytes) == 1
    assert comp.padding_bits == 3


def test_single_distinct_byte_roundtrip_via_container():
    comp = compress(b"\x00" * 17)
    rt = CompressData.try_from_bytes(comp.to_bytes())
    assert decompress(rt) == b"\x00" * 17


def test_empty_input_panics():
    with pytest.raises(ValueError, match="provided empty weights"):
        compress(b"")


def test_compressdata_validation():
    tree = HuffTree.from_weights(ByteWeights.from_bytes(b"ab"))
    with pytest.raises(ValueError, match="comp_bytes are empty"):
        CompressData(b"", 0, tree)
    with pytest.raises(ValueError, match="padding bits"):
        CompressData(b"\x00", 8, tree)


def test_try_from_bytes_errors():
    with pytest.raises(CompressedDataFromBytesError, match="slice is empty"):
        CompressData.try_from_bytes(b"")
    with pytest.raises(CompressedDataFromBytesError, match="tree length"):
        CompressData.try_from_bytes(b"\x00\x00")
    with pytest.raises(ValueError, match="at least 2"):
        CompressData.try_from_bytes(b"\x00\x00\x00\x00\x01\xff\xff\xff")
    with pytest.raises(CompressedDataFromBytesError, match="too short to read tree"):
        CompressData.try_from_bytes(b"\x00\x00\x00\x01\x00" + b"\xff" * 3)
    comp = compress(b"abbccc").to_bytes()
    with pytest.raises(CompressedDataFromBytesError, match="invalid tree"):
        bad = bytearray(comp)
        bad[5] ^= 0xFF
        CompressData.try_from_bytes(bytes(bad))


def test_roundtrip_random_data():
    rng = np.random.default_rng(42)
    for n in (1, 2, 7, 8, 255, 256, 1000, 65536):
        for alphabet in (2, 17, 256):
            data = rng.integers(0, alphabet, n, dtype=np.uint8).tobytes()
            comp = compress(data)
            assert decompress(comp) == data, (n, alphabet)
            rt = CompressData.try_from_bytes(comp.to_bytes())
            assert decompress(rt) == data, (n, alphabet)


def test_roundtrip_all_paddings():
    # exercise every data padding value 0..7 (SURVEY §7 hard part 3)
    base = b"abbccc"  # 9 bits payload
    for extra in range(8):
        data = base + b"c" * extra  # each 'c' adds 1 bit
        comp = compress(data)
        assert decompress(comp) == data
        rt = CompressData.try_from_bytes(comp.to_bytes())
        assert decompress(rt) == data


def test_compression_ratio_sane():
    # highly skewed data must compress well below 8 bits/byte
    data = b"a" * 10000 + b"b" * 100 + b"c" * 10
    comp = compress(data)
    assert len(comp.comp_bytes) < len(data) / 4


def test_optimality_vs_entropy():
    # Huffman is within 1 bit/symbol of entropy; sanity-check code lengths
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 100000, dtype=np.uint8).tobytes()
    comp = compress(data)
    # uniform bytes: every code must be exactly 8 bits
    lens, _ = comp.huff_tree.encode_tables()
    assert set(np.unique(lens)) <= {7, 8}


def test_container_non_u8_letter_type():
    # wire form for wider letters (letter.rs:57-60 parity at container level)
    from tpuhuff import CompressData, compress_with_tree, HuffTree

    letters = [1000, 2000, 2000, 70000, 70000, 70000]
    weights = {}
    for l in letters:
        weights[l] = weights.get(l, 0) + 1
    tree = HuffTree.from_weights(weights)
    comp = compress_with_tree(letters, tree, "u32")
    raw = comp.to_bytes()
    rt = CompressData.try_from_bytes(raw, "u32")
    assert decompress(rt) == letters
    # tree bin carries 32 bits per leaf
    assert int.from_bytes(raw[1:5], "big") == (2 * 3 - 1 + 32 * 3 + 7) // 8

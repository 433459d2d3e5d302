"""Histogram tests mirroring the reference's ByteWeights doctests."""

import numpy as np

from tpuhuff import ByteWeights, build_weights_map
from tpuhuff.core.bits import BitString, calc_padding_bits, offset_bytes


def test_from_bytes():
    # weights.rs:258-264
    bw = ByteWeights.from_bytes(b"fffff")
    assert bw.get(ord("f")) == 5
    assert len(bw) == 1


def test_iteration_order():
    # weights.rs:152-160: ascending byte order, zero bins skipped
    bw = ByteWeights.from_bytes(bytes([0, 1, 1, 2, 2, 2]))
    assert list(bw) == [(0, 1), (1, 2), (2, 3)]
    for byte, weight in bw:
        assert byte == weight - 1


def test_add():
    # weights.rs:161-173
    bw = ByteWeights.from_bytes(b"aabbb")
    other = ByteWeights.from_bytes(b"aaabbc")
    bw += other
    assert bw.get(ord("a")) == 5
    assert bw.get(ord("b")) == 5
    assert bw.get(ord("c")) == 1


def test_threaded_from_bytes_equiv():
    # weights.rs:286-292 — same result as from_bytes
    data = np.random.default_rng(0).integers(0, 256, 100000, dtype=np.uint8)
    assert ByteWeights.threaded_from_bytes(data, 12) == ByteWeights.from_bytes(data)


def test_get_missing_is_none():
    bw = ByteWeights.from_bytes(b"abc")
    assert bw.get(ord("z")) is None


def test_build_weights_map():
    # weights.rs:62-69
    w = build_weights_map([12, -543, 12, 66, 66, 66])
    assert w[-543] == 1
    assert w[12] == 2
    assert w[66] == 3


def test_build_weights_map_bytes_first_occurrence_order():
    w = build_weights_map(b"cabac")
    assert list(w.keys()) == [ord("c"), ord("a"), ord("b")]
    assert w[ord("c")] == 2 and w[ord("a")] == 2 and w[ord("b")] == 1


def test_calc_padding_bits():
    # utils.rs:37-40
    assert calc_padding_bits(0) == 0
    assert calc_padding_bits(8) == 0
    assert calc_padding_bits(1) == 7
    assert calc_padding_bits(9) == 7
    assert calc_padding_bits(15) == 1


def test_offset_bytes():
    # huff/src/utils.rs:2-25: shift right by n bits
    assert offset_bytes(b"\xff", 0) == b"\xff"
    assert offset_bytes(b"\xff", 1) == bytes([0b01111111, 0b10000000])
    assert offset_bytes(b"\xff", 8) == b"\x00\xff"
    assert offset_bytes(b"\xab\xcd", 4) == bytes([0x0A, 0xBC, 0xD0])


def test_bitstring_basics():
    s = BitString.from_bits([1, 0, 1])
    assert s.to01() == "101"
    assert s.to_bytes() == bytes([0b10100000])
    assert list(s) == [1, 0, 1]
    assert s[0] == 1 and s[1] == 0 and s[-1] == 1
    s2 = BitString.from_bytes(s.to_bytes(), 3)
    assert s2 == s
    assert s.pop() == 1
    assert s.to01() == "10"


def test_ration_vec():
    # huff_coding/src/utils.rs:6-28
    from tpuhuff.core.utils import ration_vec, size_of_bits

    assert ration_vec([1, 2, 3, 4, 5, 6], 3) == [[1, 2], [3, 4], [5, 6]]
    assert ration_vec([1, 2, 3, 4, 5, 6, 7], 3) == [[1, 2], [3, 4], [5, 6, 7]]
    assert ration_vec([1, 2], 5) == [[1, 2]]
    assert size_of_bits("u8") == 8
    assert size_of_bits("u128") == 128

"""C++ native runtime tests: parity with the numpy reference paths."""

import numpy as np
import pytest

from tpuhuff import ByteWeights, HuffTree, compress, decompress
from tpuhuff.core.codec import pack_codes_u8, unpack_codes_u8
from tpuhuff import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime failed to build"
)


def _random_tree_and_data(seed, n, alphabet):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, alphabet, n, dtype=np.uint8)
    tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
    return tree, data


def test_hist_matches_bincount():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 3_000_000, dtype=np.uint8)
    assert np.array_equal(native.hist(data), np.bincount(data, minlength=256))


@pytest.mark.parametrize("threads", [1, 4])
@pytest.mark.parametrize("n", [1, 7, 1000, (1 << 21) + 13])
def test_encode_matches_numpy(threads, n):
    tree, data = _random_tree_and_data(n, n, 37)
    lens, codes = tree.encode_tables()
    ref_payload, ref_pad = pack_codes_u8(data, lens, codes)
    payload, pad = native.encode(data, lens, codes, threads=threads)
    assert pad == ref_pad
    assert payload == ref_payload


def test_encode_missing_letter():
    tree, _ = _random_tree_and_data(0, 100, 10)
    lens, codes = tree.encode_tables()
    data = np.full(10, 200, dtype=np.uint8)  # byte 200 not in tree
    from tpuhuff.core.format import CompressError

    with pytest.raises(CompressError):
        native.encode(data, lens, codes)


@pytest.mark.parametrize("alphabet", [2, 17, 256])
def test_decode_roundtrip(alphabet):
    tree, data = _random_tree_and_data(alphabet, 100_000, alphabet)
    lens, codes = tree.encode_tables()
    payload, pad = native.encode(data, lens, codes)
    arr = np.frombuffer(payload, dtype=np.uint8)
    nbits = len(payload) * 8 - pad
    tables = native.build_dfa(tree)
    out = native.decode(arr, 0, nbits, tables, nbits)
    assert out == data.tobytes()


def test_decode_bit_ranges():
    # decoding [s, e) of two concatenated symbol streams recovers each part
    tree, data = _random_tree_and_data(5, 10_000, 50)
    lens, codes = tree.encode_tables()
    a, b = data[:6000], data[6000:]
    pa, _ = pack_codes_u8(a, lens, codes)
    bits_a = int(lens[a].astype(np.int64).sum())
    payload, pad = native.encode(data, lens, codes)
    arr = np.frombuffer(payload, dtype=np.uint8)
    nbits = len(payload) * 8 - pad
    tables = native.build_dfa(tree)
    assert native.decode(arr, 0, bits_a, tables, 6000) == a.tobytes()
    assert native.decode(arr, bits_a, nbits, tables, 4000) == b.tobytes()
    del pa


def test_decode_blocks_parallel():
    tree, data = _random_tree_and_data(9, 200_000, 100)
    lens, codes = tree.encode_tables()
    block = 4096
    nblocks = (data.size + block - 1) // block
    # encode each block and record bit offsets (the .hf2 layout)
    payload, pad = native.encode(data, lens, codes)
    arr = np.frombuffer(payload, dtype=np.uint8)
    bits = lens[data].astype(np.int64)
    block_bits = np.add.reduceat(bits, np.arange(0, data.size, block))
    ends = np.cumsum(block_bits)
    starts = ends - block_bits
    out_offsets = np.arange(nblocks, dtype=np.uint64) * block
    out_caps = np.full(nblocks, block, dtype=np.uint64)
    out_caps[-1] = data.size - (nblocks - 1) * block
    tables = native.build_dfa(tree)
    out, out_lens = native.decode_blocks(
        arr, starts.astype(np.uint64), ends.astype(np.uint64), tables,
        out_offsets, out_caps, threads=4,
    )
    assert np.array_equal(out_lens.astype(np.int64), out_caps.astype(np.int64))
    assert out[: data.size].tobytes() == data.tobytes()


def test_native_is_default_dispatch():
    # compress/decompress should round-trip through the native path
    data = np.random.default_rng(3).integers(0, 200, 500_000, dtype=np.uint8)
    comp = compress(data.tobytes())
    assert decompress(comp) == data.tobytes()


def test_skewed_tree_native():
    # deep tree (fib weights): codes up to 30+ bits through the DFA
    n = 30
    fib = [1, 1]
    for _ in range(n - 2):
        fib.append(fib[-1] + fib[-2])
    counts = np.zeros(256, dtype=np.int64)
    counts[:n] = fib
    tree = HuffTree.from_weights(ByteWeights(counts))
    rng = np.random.default_rng(0)
    data = rng.choice(np.arange(n, dtype=np.uint8), 50_000, p=np.array(fib) / sum(fib))
    lens, codes = tree.encode_tables()
    payload, pad = native.encode(data, lens, codes)
    ref_payload, ref_pad = pack_codes_u8(data, lens, codes)
    assert (payload, pad) == (ref_payload, ref_pad)
    arr = np.frombuffer(payload, dtype=np.uint8)
    nbits = len(payload) * 8 - pad
    tables = native.build_dfa(tree)
    assert native.decode(arr, 0, nbits, tables, nbits) == data.tobytes()

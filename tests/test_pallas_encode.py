"""Pallas merge-pack kernel: bit parity with the XLA encoder (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuhuff import ByteWeights, HuffTree
from tpuhuff.core.codec import pack_codes_u8
from tpuhuff.kernels.encode import encode_blocks, make_encode_tables, words_to_payload
from tpuhuff.kernels.pallas_encode import encode_blocks_pallas


def _setup(alphabet, B, N, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, alphabet, (B, N), dtype=np.uint8)
    tree = HuffTree.from_weights(ByteWeights.from_bytes(data.reshape(-1)))
    dl, da = make_encode_tables(*tree.encode_tables())
    return data, tree, dl, da


@pytest.mark.parametrize("alphabet", [2, 41, 256])
def test_pallas_pack_matches_xla(alphabet):
    data, tree, dl, da = _setup(alphabet, 4, 256, seed=alphabet)
    w_ref, b_ref = encode_blocks(jnp.asarray(data), dl, da)
    w, b = encode_blocks_pallas(jnp.asarray(data), dl, da, interpret=True)
    assert np.array_equal(np.asarray(b), np.asarray(b_ref))
    assert np.array_equal(np.asarray(w), np.asarray(w_ref))


def test_pallas_pack_matches_host_packer():
    data, tree, dl, da = _setup(100, 2, 512, seed=7)
    lens, codes = tree.encode_tables()
    w, b = encode_blocks_pallas(jnp.asarray(data), dl, da, interpret=True)
    for blk in range(2):
        ref, pad = pack_codes_u8(data[blk], lens, codes)
        assert int(b[blk]) == len(ref) * 8 - pad
        assert words_to_payload(np.asarray(w[blk]), int(b[blk])) == ref


def test_pallas_pack_valid_lens_masking():
    data, tree, dl, da = _setup(50, 3, 128, seed=1)
    valid = jnp.asarray(np.array([128, 77, 0], dtype=np.int32))
    w_ref, b_ref = encode_blocks(jnp.asarray(data), dl, da, valid)
    w, b = encode_blocks_pallas(jnp.asarray(data), dl, da, valid, interpret=True)
    assert np.array_equal(np.asarray(b), np.asarray(b_ref))
    assert np.array_equal(np.asarray(w), np.asarray(w_ref))


def test_pallas_pack_deep_codes():
    # 23-bit codes through the kernel
    n = 24
    fib = [1, 1]
    for _ in range(n - 2):
        fib.append(fib[-1] + fib[-2])
    counts = np.zeros(256, dtype=np.int64)
    counts[:n] = fib
    tree = HuffTree.from_weights(ByteWeights(counts))
    rng = np.random.default_rng(3)
    data = rng.integers(0, n, (2, 256), dtype=np.uint8)
    dl, da = make_encode_tables(*tree.encode_tables())
    w_ref, b_ref = encode_blocks(jnp.asarray(data), dl, da)
    w, b = encode_blocks_pallas(jnp.asarray(data), dl, da, interpret=True)
    assert np.array_equal(np.asarray(b), np.asarray(b_ref))
    assert np.array_equal(np.asarray(w), np.asarray(w_ref))

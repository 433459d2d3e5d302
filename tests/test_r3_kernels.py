"""Round-3 kernel additions: fused-input encode layout, Pallas histogram,
ride-along missing-letter count.

All Pallas runs use interpret mode on the CPU backend (conftest); the
bit-level contract is identical on hardware (r3 TPU sessions verified the
same outputs at 16/100 MiB).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuhuff.core.canonical import canonicalize
from tpuhuff.core.codec import pack_codes_u8
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels.encode import (
    encode_blocks, make_canonical_encode_tables, make_encode_tables,
    words_to_payload,
)
from tpuhuff.kernels.pallas_encode2 import (
    encode_blocks_pallas2, fused_layout_ok,
)
from tpuhuff.kernels.pallas_histogram import histogram_pallas


def _tree_tables(data_bytes):
    tree = canonicalize(HuffTree.from_weights(
        ByteWeights.from_bytes(data_bytes)))
    lens_lut, codes_lut = tree.encode_tables()
    canon = make_canonical_encode_tables(tree)
    return tree, np.asarray(lens_lut), np.asarray(codes_lut), canon


def test_fused_layout_parity_and_miss():
    rng = np.random.default_rng(3)
    base = np.frombuffer(b"fused layout parity 012345 " * 4096,
                         dtype=np.uint8)
    data = base[: 200 * 256].reshape(200, 256).copy()
    data[3, :40] = rng.integers(0, 200, 40, dtype=np.uint8)
    tree, lens_lut, codes_lut, canon = _tree_tables(data.tobytes())
    ml = canon[4]
    assert fused_layout_ok(256, ml)
    valid = np.full(200, 256, np.int32)
    valid[3] = 40
    valid[199] = 1
    w, b, m = encode_blocks_pallas2(
        jnp.asarray(data), canon[:4], ml,
        valid_lens=jnp.asarray(valid), interpret=True,
        full_alphabet=bool(canon[5]), with_miss=True)
    assert int(m) == 0
    for i in (0, 3, 64, 199):
        ref, _ = pack_codes_u8(data[i, : valid[i]], lens_lut, codes_lut)
        assert words_to_payload(np.asarray(w[i]), int(b[i])) == ref


def test_fused_miss_detects_stale_tree():
    # build a tree over a limited alphabet, then inject a foreign byte
    data = np.frombuffer(b"abcabcababc!" * 512, dtype=np.uint8)[
        : 16 * 256].reshape(16, 256).copy()
    tree, lens_lut, codes_lut, canon = _tree_tables(data.tobytes())
    assert canon is not None and not canon[5]  # sparse alphabet
    data2 = data.copy()
    data2[4, 7] = 255  # not in the alphabet
    _, _, m = encode_blocks_pallas2(
        jnp.asarray(data2), canon[:4], canon[4], interpret=True,
        full_alphabet=False, with_miss=True)
    assert int(m) == 1


def test_encode_blocks_with_miss_nonfused_path():
    # force the XLA merge (no canon tables) — miss comes from the inline pass
    data = np.frombuffer(b"xyzzyx" * 512, dtype=np.uint8)[
        : 8 * 128].reshape(8, 128).copy()
    tree, lens_lut, codes_lut, _ = _tree_tables(data.tobytes())
    dl, da = make_encode_tables(lens_lut, codes_lut)
    data2 = data.copy()
    data2[2, 3] = 81  # 'Q' not in alphabet
    w, b, m = encode_blocks(jnp.asarray(data2), dl, da,
                            max_code_len=int(lens_lut.max()),
                            with_miss=True)
    assert int(m) == 1


@pytest.mark.parametrize("n", [1 << 17, 100_000, 3 << 17])
def test_pallas_histogram_exact(n):
    rng = np.random.default_rng(n)
    d = rng.integers(0, 256, n, dtype=np.uint8)
    got = np.asarray(histogram_pallas(jnp.asarray(d), interpret=True))
    assert np.array_equal(got, np.bincount(d, minlength=256))


def test_histogram_dispatcher_cpu_matches():
    from tpuhuff.kernels.histogram import histogram

    rng = np.random.default_rng(9)
    d = rng.integers(0, 256, 70_000, dtype=np.uint8)
    got = np.asarray(histogram(jnp.asarray(d)))
    assert np.array_equal(got, np.bincount(d, minlength=256))

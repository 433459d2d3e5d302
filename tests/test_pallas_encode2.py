"""Pallas v2 (fused canonical LUT + bounded merge): bit parity with the XLA
encoder (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuhuff import ByteWeights, HuffTree
from tpuhuff.core.canonical import canonicalize
from tpuhuff.kernels.encode import (
    encode_blocks,
    make_canonical_encode_tables,
    make_encode_tables,
)
from tpuhuff.kernels.pallas_encode2 import encode_blocks_pallas2


def _setup(alphabet, B, N, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, alphabet, (B, N), dtype=np.uint8)
    tree = canonicalize(
        HuffTree.from_weights(ByteWeights.from_bytes(data.reshape(-1)))
    )
    dl, da = make_encode_tables(*tree.encode_tables())
    tabs = make_canonical_encode_tables(tree)
    assert tabs is not None
    return data, tree, dl, da, tabs


@pytest.mark.parametrize("alphabet", [2, 41, 256])
def test_pallas2_matches_xla(alphabet):
    data, tree, dl, da, tabs = _setup(alphabet, 4, 256, seed=alphabet)
    ml = tabs[4]
    w_ref, b_ref = encode_blocks(jnp.asarray(data), dl, da, max_code_len=ml)
    w, b = encode_blocks_pallas2(jnp.asarray(data), tabs[:4], ml,
                                 interpret=True)
    assert np.array_equal(np.asarray(b), np.asarray(b_ref))
    m = min(w.shape[1], w_ref.shape[1])
    assert np.array_equal(np.asarray(w)[:, :m], np.asarray(w_ref)[:, :m])
    assert not np.asarray(w)[:, m:].any() and not np.asarray(w_ref)[:, m:].any()


def test_pallas2_valid_lens_and_missing():
    # ragged blocks + a byte outside the alphabet (must emit nothing)
    rng = np.random.default_rng(5)
    data = rng.integers(0, 60, (4, 128), dtype=np.uint8)
    tree = canonicalize(
        HuffTree.from_weights(ByteWeights.from_bytes(data[:, :100].reshape(-1)))
    )
    dl, da = make_encode_tables(*tree.encode_tables())
    tabs = make_canonical_encode_tables(tree)
    ml = tabs[4]
    data[:, 100:] = 200  # not in the alphabet
    valid = np.array([128, 100, 1, 0], dtype=np.int32)
    w_ref, b_ref = encode_blocks(jnp.asarray(data), dl, da,
                                 jnp.asarray(valid), max_code_len=ml)
    w, b = encode_blocks_pallas2(jnp.asarray(data), tabs[:4], ml,
                                 valid_lens=jnp.asarray(valid), interpret=True)
    assert np.array_equal(np.asarray(b), np.asarray(b_ref))
    m = min(w.shape[1], w_ref.shape[1])
    assert np.array_equal(np.asarray(w)[:, :m], np.asarray(w_ref)[:, :m])


def test_pallas2_deep_tree_no_halving():
    # fib weights -> ML 23 > 16: the in-word first level is skipped
    n = 24
    fib = [1, 1]
    for _ in range(n - 2):
        fib.append(fib[-1] + fib[-2])
    counts = np.zeros(256, dtype=np.int64)
    counts[:n] = fib
    tree = canonicalize(HuffTree.from_weights(ByteWeights(counts)))
    dl, da = make_encode_tables(*tree.encode_tables())
    tabs = make_canonical_encode_tables(tree)
    ml = tabs[4]
    assert ml > 16
    rng = np.random.default_rng(0)
    data = rng.integers(0, n, (2, 256), dtype=np.uint8)
    w_ref, b_ref = encode_blocks(jnp.asarray(data), dl, da, max_code_len=ml)
    w, b = encode_blocks_pallas2(jnp.asarray(data), tabs[:4], ml,
                                 interpret=True)
    assert np.array_equal(np.asarray(b), np.asarray(b_ref))
    m = min(w.shape[1], w_ref.shape[1])
    assert np.array_equal(np.asarray(w)[:, :m], np.asarray(w_ref)[:, :m])


def test_pallas2_combined_tables_parity():
    """The r5 combined-entry path (TPUHUFF_ENC_COMBINED, VERDICT r4 #8):
    two shared-predicate 64-select trees over (acode12<<4)|len must be
    bit-identical to the ladder, incl. ragged valid lengths and
    out-of-alphabet bytes (membership rides the table: absent -> C=0)."""
    from tpuhuff.core.canonical import build_tree_for_device
    from tpuhuff.kernels import pallas_encode2 as pe2
    from tpuhuff.kernels.encode import make_combined_encode_tables

    rng = np.random.default_rng(7)
    data = rng.integers(0, 200, (4, 256), dtype=np.uint8)
    data[3, 100:] = 201  # bytes with no code in the tree
    bw = ByteWeights.from_bytes(data[:3].reshape(-1).tobytes()
                                + data[3, :100].tobytes())
    tree, _ = build_tree_for_device(bw, max_len=12)
    tree = canonicalize(tree)
    tabs = make_canonical_encode_tables(tree)
    ctabs = make_combined_encode_tables(tree)
    assert ctabs is not None and ctabs[4] <= 12
    valid = jnp.asarray(np.array([256, 256, 199, 100], np.int32))
    w_ref, b_ref = encode_blocks_pallas2(
        jnp.asarray(data), tabs[:4], tabs[4], valid_lens=valid,
        interpret=True)
    pe2.ENC_COMBINED = True
    pe2._encode_call_fused.clear_cache()
    pe2._encode_call.clear_cache()
    pe2._encode_call_cells.clear_cache()
    try:
        w, b = encode_blocks_pallas2(
            jnp.asarray(data), ctabs[:4], ctabs[4], valid_lens=valid,
            interpret=True)
    finally:
        pe2.ENC_COMBINED = False
        pe2._encode_call_fused.clear_cache()
        pe2._encode_call.clear_cache()
        pe2._encode_call_cells.clear_cache()
    assert np.array_equal(np.asarray(b), np.asarray(b_ref))
    assert np.array_equal(np.asarray(w), np.asarray(w_ref))

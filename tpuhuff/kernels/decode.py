"""Device decode: lane-parallel prefix-code decoding in JAX/XLA.

The parallel replacement for the reference's bit-serial tree walk
(`/root/reference/huff_coding/src/comp.rs:487-519`).  A serial prefix-code
stream cannot be split mid-stream, so parallelism comes from **blocks**: the
``.hf2`` container records per-block bit offsets (SURVEY §7 hard part 2),
and every block becomes a *lane* that decodes independently — hundreds to
thousands of lanes advance one symbol per step, all vectorized.

Per step, each lane:

1. fetches a 32-bit window at its bit cursor (two u32 loads from its own
   row via ``take_along_axis``),
2. finds the matching leaf by counting interval thresholds <= window —
   for ANY prefix tree, left-to-right leaves have ascending left-aligned
   code values, so the 32-bit window space is partitioned into <= 256
   sorted intervals (no canonical-code assumption, so reference-built
   ``.hff`` trees work unchanged),
3. looks up (symbol, code length) for the interval via one-hot matmul
   (MXU-friendly), emits, and advances its cursor by the length.

Lanes whose streams are exhausted idle (masked).  The step count is the
block byte length — each step emits exactly one symbol per active lane.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.tree import HuffTree

__all__ = ["make_decode_tables", "decode_blocks_device", "payload_to_lane_words"]


def make_decode_tables(tree: HuffTree):
    """Interval tables: (thresholds u32[K], symbols i32[K], lens i32[K]).

    K = number of leaves; ``thresholds[k]`` is the left-aligned (bit-31)
    value of leaf k's code in left-to-right order — ascending for any
    binary tree, partitioning [0, 2^32).
    """
    codes = tree.read_codes()
    items = []
    for letter, code in codes.items():
        if code.length > 32:
            raise OverflowError("device decoder supports code lengths <= 32")
        aligned = code.value << (32 - code.length)
        items.append((aligned, int(letter), code.length))
    items.sort()
    thresholds = np.array([a for a, _, _ in items], dtype=np.uint32)
    symbols = np.array([s for _, s, _ in items], dtype=np.int32)
    lens = np.array([l for _, _, l in items], dtype=np.int32)
    return jnp.asarray(thresholds), jnp.asarray(symbols), jnp.asarray(lens)


def payload_to_lane_words(
    payload: bytes | np.ndarray,
    start_bits: np.ndarray,
    end_bits: np.ndarray,
    block_len: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Slice a stitched payload into per-lane u32 word rows.

    Lane k's words start at the u32 word containing ``start_bits[k]``;
    returns ``(rows (B, Wmax) uint32, bit0 (B,) int32)`` where ``bit0`` is
    the start bit offset within each row.  Wmax covers the worst block.
    """
    raw = np.frombuffer(bytes(payload), dtype=np.uint8) if not isinstance(
        payload, np.ndarray
    ) else payload.view(np.uint8)
    # pad to whole u32 words + 1 slack word for window overreach
    nwords = (raw.size + 3) // 4 + 2
    buf = np.zeros(nwords * 4, dtype=np.uint8)
    buf[: raw.size] = raw
    words = buf.view(">u4").astype(np.uint32)
    B = start_bits.size
    start_w = (start_bits // 32).astype(np.int64)
    end_w = ((end_bits + 31) // 32).astype(np.int64)
    Wmax = int(np.max(end_w - start_w + 1, initial=1))
    idx = np.minimum(start_w[:, None] + np.arange(Wmax)[None, :], words.size - 1)
    rows = words[idx]
    bit0 = (start_bits - start_w * 32).astype(np.int32)
    return rows, bit0


@functools.partial(jax.jit, static_argnames=("block_len",))
def decode_blocks_device(
    rows: jnp.ndarray,
    bit0: jnp.ndarray,
    nbits: jnp.ndarray,
    thresholds: jnp.ndarray,
    symbols: jnp.ndarray,
    lens: jnp.ndarray,
    block_len: int,
) -> jnp.ndarray:
    """Decode B lanes of up to ``block_len`` symbols each.

    ``rows``: (B, W) u32 per-lane word arrays (MSB-first bit order).
    ``bit0``/``nbits``: per-lane start offset within the row and payload bit
    count.  Returns (B, block_len) uint8 (undefined beyond each lane's
    symbol count).
    """
    B, W = rows.shape
    K = thresholds.shape[0]
    thr = thresholds.astype(jnp.uint32)[None, :]  # (1, K)
    lens_f = lens.astype(jnp.int32)
    syms_f = symbols.astype(jnp.int32)

    def step(state, _):
        pos, = state
        widx = (pos >> 5).astype(jnp.int32)
        r = (pos & 31).astype(jnp.uint32)
        w0 = jnp.take_along_axis(rows, widx[:, None], axis=1)[:, 0]
        w1 = jnp.take_along_axis(rows, (widx + 1)[:, None], axis=1)[:, 0]
        hi = jnp.where(r == 0, w0, (w0 << r))
        lo = jnp.where(r == 0, jnp.uint32(0), (w1 >> ((jnp.uint32(32) - r) & 31)))
        window = hi | lo  # next 32 bits, MSB-aligned
        # interval search: index = count(thresholds <= window) - 1
        idx = jnp.sum((thr <= window[:, None]).astype(jnp.int32), axis=1) - 1
        # one-hot lookups of (symbol, len) — MXU-friendly contraction
        onehot = (idx[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :])
        sym = jnp.sum(jnp.where(onehot, syms_f[None, :], 0), axis=1)
        ln = jnp.sum(jnp.where(onehot, lens_f[None, :], 0), axis=1)
        active = pos + ln <= bit0 + nbits
        new_pos = jnp.where(active, pos + ln, pos)
        out_sym = jnp.where(active, sym, 0).astype(jnp.uint8)
        return (new_pos,), out_sym

    (final_pos,), out = jax.lax.scan(
        step, (bit0.astype(jnp.int32),), None, length=block_len
    )
    del final_pos
    return out.T  # (B, block_len)


def decode_hf2_device(header, payload: bytes) -> bytes:
    """Decode a whole .hf2 payload on device; returns the original bytes."""
    ends = header.end_bits.astype(np.int64)
    starts = np.concatenate([[0], ends[:-1]])
    rows, bit0 = payload_to_lane_words(payload, starts, ends, header.block_len)
    thr, syms, lens = make_decode_tables(header.tree)
    nbits = (ends - starts).astype(np.int32)
    out = decode_blocks_device(
        jnp.asarray(rows), jnp.asarray(bit0), jnp.asarray(nbits),
        thr, syms, lens, header.block_len,
    )
    out = np.asarray(out)
    B = header.num_blocks
    result = np.zeros(header.orig_len, dtype=np.uint8)
    for k in range(B):
        cap = min(header.block_len, header.orig_len - k * header.block_len)
        result[k * header.block_len : k * header.block_len + cap] = out[k, :cap]
    return result.tobytes()

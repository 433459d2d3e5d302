"""Distributed (mesh / multi-chip / multi-host) compression pipelines."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .mesh import BLOCK_AXIS, block_sharding, make_mesh, replicated_sharding
from .block import (
    encode_pipeline,
    pad_to_blocks,
    sharded_decode_blocks,
    sharded_encode,
    sharded_histogram,
)

__all__ = [
    "BLOCK_AXIS",
    "make_mesh",
    "block_sharding",
    "replicated_sharding",
    "encode_pipeline",
    "pad_to_blocks",
    "sharded_decode_blocks",
    "sharded_encode",
    "sharded_histogram",
    "compress_sharded",
    "stitch_words",
]


def stitch_words(words: np.ndarray, bits: np.ndarray) -> Tuple[bytes, int]:
    """Bit-carry concat of per-block word arrays into one payload.

    ``words``: (B, W) uint32 MSB-first; ``bits``: (B,) exact bit lengths.
    Uses the threaded C++ stitcher when available, else a numpy fallback.
    """
    rows = np.ascontiguousarray(words).astype(">u4").view(np.uint8)
    rows = rows.reshape(words.shape[0], words.shape[1] * 4)
    bits = np.asarray(bits, dtype=np.uint64)
    try:
        from .. import native

        if native.available():
            return native.stitch_blocks(rows, bits)
    except Exception:
        pass
    # numpy/python fallback: big-int shift-or (correct, slow)
    from ..core.bits import calc_padding_bits

    value = 0
    total = 0
    for b in range(rows.shape[0]):
        nb = int(bits[b])
        if nb == 0:
            continue
        chunk = int.from_bytes(rows[b].tobytes(), "big") >> (rows.shape[1] * 8 - nb)
        value = (value << nb) | chunk
        total += nb
    pad = calc_padding_bits(total)
    payload = (value << pad).to_bytes((total + pad) // 8, "big") if total else b""
    return payload, pad


def compress_sharded(data, block_len: int = 65536, mesh=None):
    """Device-parallel compress to a :class:`~tpuhuff.core.format.CompressData`.

    Bit-identical to ``tpuhuff.compress`` (same tree, same stream) — the
    blocks are packed on-device under ``shard_map`` and stitched on host.
    """
    from ..core.format import CompressData

    words, bits, tree, orig_len = encode_pipeline(
        np.frombuffer(bytes(data), dtype=np.uint8)
        if not isinstance(data, np.ndarray)
        else data,
        block_len=block_len,
        mesh=mesh,
    )
    payload, padding = stitch_words(words, bits)
    return CompressData(payload, padding, tree)

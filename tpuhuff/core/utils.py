"""Small utilities mirroring the reference's `huff_coding/src/utils.rs`.

``calc_padding_bits`` lives in :mod:`tpuhuff.core.bits`; this module adds
the remaining helpers for API parity.
"""

from __future__ import annotations

from typing import List, Sequence, TypeVar

from .bits import calc_padding_bits  # re-export for parity
from .letters import letter_type

T = TypeVar("T")

__all__ = ["ration_vec", "size_of_bits", "calc_padding_bits"]


def ration_vec(seq: Sequence[T], ration_count: int) -> List[Sequence[T]]:
    """Split ``seq`` into ``ration_count`` chunks (`utils.rs:6-28`):
    remainder goes into the last chunk; a too-small input yields a single
    chunk containing everything."""
    n = len(seq)
    per = n // ration_count
    if per == 0:
        return [seq[:]]
    out: List[Sequence[T]] = []
    pos = 0
    for i in range(ration_count):
        if i == ration_count - 1:
            out.append(seq[pos:])
            break
        out.append(seq[pos : pos + per])
        pos += per
    return out


def size_of_bits(ltype) -> int:
    """``size_of::<T>() * 8`` (`utils.rs:31-33`) for a letter type."""
    return letter_type(ltype).size_bits

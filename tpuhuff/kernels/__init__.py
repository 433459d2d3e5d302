"""JAX/XLA/Pallas device kernels: histogram, bit-pack encode, decode.

Backend selection: by default :func:`encode_blocks` auto-routes to the
fused canonical Pallas VMEM kernel on TPU (when canonical tables are given
and ``max_code_len <= 16``) and to the pure-XLA doubling merge otherwise.
``TPUHUFF_BACKEND=xla`` force-disables the auto-Pallas path;
``TPUHUFF_BACKEND=pallas`` selects the v1 (dense-LUT) Pallas pack kernel
for :func:`get_block_encoder` callers.
"""

import os

from .encode import (
    block_bit_lengths,
    encode_blocks,
    make_encode_tables,
    words_to_payload,
)
from .histogram import histogram
from .pallas_encode import encode_blocks_pallas


def get_block_encoder():
    """The configured (data, lens_lut, acodes_lut, valid_lens) -> (words,
    bits) implementation."""
    if os.environ.get("TPUHUFF_BACKEND", "xla").lower() == "pallas":
        return encode_blocks_pallas
    return encode_blocks


__all__ = [
    "block_bit_lengths",
    "encode_blocks",
    "encode_blocks_pallas",
    "get_block_encoder",
    "make_encode_tables",
    "words_to_payload",
    "histogram",
]

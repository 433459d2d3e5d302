"""JAX/XLA/Pallas device kernels: histogram, bit-pack encode, decode.

Backend selection: ``TPUHUFF_BACKEND=xla`` (default) uses the pure-XLA
doubling merge; ``TPUHUFF_BACKEND=pallas`` routes block packing through the
VMEM-resident Pallas kernel (same bits, less HBM traffic).
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

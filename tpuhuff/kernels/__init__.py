"""JAX/XLA/Pallas device kernels: histogram, bit-pack encode, decode."""

from .encode import (
    block_bit_lengths,
    encode_blocks,
    make_encode_tables,
    words_to_payload,
)
from .histogram import histogram

__all__ = [
    "block_bit_lengths",
    "encode_blocks",
    "make_encode_tables",
    "words_to_payload",
    "histogram",
]

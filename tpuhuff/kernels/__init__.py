"""JAX/XLA/Pallas device kernels: histogram, bit-pack encode, decode.

Backend selection: by default :func:`encode_blocks` auto-routes to the
fused canonical Pallas VMEM kernel on TPU (when canonical tables are given,
``max_code_len <= 16``, and the block length fits the VMEM budget —
``encode.PALLAS_MAX_BLOCK``) and to the pure-XLA doubling merge otherwise.
``TPUHUFF_BACKEND=xla`` force-disables the Pallas route;
``TPUHUFF_BACKEND=pallas`` force-enables it (interpret mode off-TPU).
"""

from .encode import (
    PALLAS_MAX_BLOCK,
    block_bit_lengths,
    count_missing,
    encode_blocks,
    make_encode_tables,
    words_to_payload,
)
from .histogram import histogram

__all__ = [
    "PALLAS_MAX_BLOCK",
    "block_bit_lengths",
    "count_missing",
    "encode_blocks",
    "make_encode_tables",
    "words_to_payload",
    "histogram",
]

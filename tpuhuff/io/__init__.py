"""Streaming file IO: .hff (reference-compatible) and .hf2 (block-indexed),
plus shared-tree dataset compression (config 4)."""

from .dataset import (build_shared_tree, compress_dataset,
                      decompress_dataset, tree_from_counts)
from .hff import Hf2Header, read_hf2_header, write_hf2
from .stream import (
    StreamError,
    decode_hff_indexed,
    huff_tree_from_stream,
    read_compress_write,
    read_compress_write_hf2,
    read_decompress_write,
    read_decompress_write_hf2,
    transcode_hff_to_hf2,
)

__all__ = [
    "Hf2Header",
    "read_hf2_header",
    "write_hf2",
    "StreamError",
    "huff_tree_from_stream",
    "read_compress_write",
    "read_compress_write_hf2",
    "read_decompress_write",
    "read_decompress_write_hf2",
    "transcode_hff_to_hf2",
    "decode_hff_indexed",
    "build_shared_tree",
    "compress_dataset",
    "decompress_dataset",
    "tree_from_counts",
]

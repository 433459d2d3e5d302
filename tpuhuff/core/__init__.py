"""Core: letters, weights, tree, container format, block codec (L1-L3)."""

from .bits import BitString, calc_padding_bits, offset_bytes
from .codec import compress, compress_with_tree, decompress, pack_codes_u8, unpack_codes_u8
from .format import CompressData, CompressError, CompressedDataFromBytesError
from .letters import LetterType, letter_type, U8, U16, U32, U64, U128, I8, I16, I32, I64, I128
from .tree import Code, EmptyWeightsError, FromBinError, HuffTree
from .weights import ByteWeights, build_weights_map

__all__ = [
    "BitString", "calc_padding_bits", "offset_bytes",
    "compress", "compress_with_tree", "decompress",
    "pack_codes_u8", "unpack_codes_u8",
    "CompressData", "CompressError", "CompressedDataFromBytesError",
    "LetterType", "letter_type",
    "U8", "U16", "U32", "U64", "U128", "I8", "I16", "I32", "I64", "I128",
    "Code", "EmptyWeightsError", "FromBinError", "HuffTree",
    "ByteWeights", "build_weights_map",
]

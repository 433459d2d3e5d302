"""An INDEPENDENT `.hff` decoder, written strictly from the format spec.

This module deliberately imports NOTHING from `tpuhuff` and shares no
code with it: it is a second implementation of the reference's on-disk
format (`/root/reference/huff/README.md:55-65`, `huff_coding/src/
comp.rs:279-300`, `tree_inner.rs:522-604`), used by the tests as an
interop oracle — if tpuhuff's writers and this decoder agree on rich
corpora, and both agree on the reference-origin fixtures, format
compliance is cross-checked by construction rather than by shared code.

Spec recap (all from the reference's docs/doctests):
  byte 0      = (tree_padding_bits << 4) | data_padding_bits
  bytes 1..5  = u32 big-endian tree length T in bytes
  bytes 5..5+T= tree bits, pre-order: '1' = internal node (then left
                subtree, then right), '0' = leaf followed by 8 big-endian
                letter bits; zero-padded with tree_padding low bits
  bytes 5+T.. = payload: concatenated codes, MSB-first within each byte;
                the final byte's low data_padding bits are padding
  decode      = walk root->leaf, 0 = left, 1 = right, emit leaf letter,
                reset to root; a single-leaf tree emits its letter once
                per payload bit
"""


class _BitReader:
    def __init__(self, data: bytes, total_bits: int):
        self.data = data
        self.total = total_bits
        self.pos = 0

    def take(self) -> int:
        if self.pos >= self.total:
            raise ValueError("bit stream exhausted")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def take_byte(self) -> int:
        v = 0
        for _ in range(8):
            v = (v << 1) | self.take()
        return v


def _read_tree(bits: _BitReader):
    """Returns a nested tuple tree: ('leaf', letter) or ('node', l, r)."""
    if bits.take() == 1:
        left = _read_tree(bits)
        right = _read_tree(bits)
        return ("node", left, right)
    return ("leaf", bits.take_byte())


def decode_hff(blob: bytes) -> bytes:
    if len(blob) < 5:
        raise ValueError("too short for a header")
    tree_padding = blob[0] >> 4
    data_padding = blob[0] & 0x0F
    tree_len = int.from_bytes(blob[1:5], "big")
    tree_bytes = blob[5 : 5 + tree_len]
    if len(tree_bytes) != tree_len:
        raise ValueError("truncated tree")
    tb = _BitReader(tree_bytes, tree_len * 8 - tree_padding)
    tree = _read_tree(tb)
    if tb.pos != tb.total:
        raise ValueError("leftover tree bits")
    payload = blob[5 + tree_len :]
    total_bits = len(payload) * 8 - data_padding
    if total_bits < 0:
        raise ValueError("bad padding")
    out = bytearray()
    if tree[0] == "leaf":
        # degenerate single-letter stream: one letter per payload bit
        return bytes([tree[1]]) * total_bits
    pb = _BitReader(payload, total_bits)
    node = tree
    while pb.pos < pb.total:
        node = node[2] if pb.take() else node[1]
        if node[0] == "leaf":
            out.append(node[1])
            node = tree
    return bytes(out)

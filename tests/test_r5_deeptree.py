"""Adversarial deep-tree coverage for the device length-limit path
(VERDICT r4 #9): a Fibonacci-weight input whose OPTIMAL Huffman tree is
deeper than 32 bits, driven through ``build_tree_for_device`` and the
device ``.hf2`` writer end to end.

Fibonacci weights are the canonical depth adversary: n symbols with
fib(1..n) counts build a maximally skewed tree of depth n-1
(`tree_inner.rs:289-303` would build the same shape), so n = 34 symbols
force depth 33 > the kernels' 32-bit codeword lanes.  The writer must
switch to the optimal length-limited (package-merge) code — a valid,
decodable container at a quantified, near-zero size cost (PARITY.md).
"""

import numpy as np

from tpuhuff.core.canonical import build_tree_for_device
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.io.hff import read_hf2_header
from tpuhuff.io.stream import (
    read_compress_write_hf2,
    read_decompress_write_hf2,
)

N_SYMS = 34


def _fib_data() -> np.ndarray:
    """~15 MB whose byte histogram is fib(1..34) (shuffled)."""
    fib = [1, 1]
    while len(fib) < N_SYMS:
        fib.append(fib[-1] + fib[-2])
    data = np.repeat(np.arange(N_SYMS, dtype=np.uint8), fib)
    rng = np.random.default_rng(21)
    rng.shuffle(data)
    return data


def test_fib_tree_exceeds_32_and_limit_fires():
    data = _fib_data()
    bw = ByteWeights(np.bincount(data, minlength=256).astype(np.int64))
    host_tree = HuffTree.from_weights(bw)
    assert host_tree.max_code_len() == N_SYMS - 1 > 32
    dev_tree, limited = build_tree_for_device(bw, max_len=32)
    assert limited is True
    assert dev_tree.max_code_len() <= 32
    # package-merge optimality bound check: the limited cost may exceed
    # the unconstrained optimum only marginally (the constraint binds a
    # vanishing probability mass)
    lens_h, _ = host_tree.encode_tables()
    lens_d, _ = dev_tree.encode_tables()
    counts = bw.counts.astype(np.int64)
    cost_h = int((counts * np.asarray(lens_h, dtype=np.int64)).sum())
    cost_d = int((counts * np.asarray(lens_d, dtype=np.int64)).sum())
    assert cost_d >= cost_h  # the constraint can only cost bits
    delta = (cost_d - cost_h) / cost_h
    assert delta < 0.001, f"size delta {delta:.6f} exceeds the PM bound"


def test_fib_device_hf2_writer_end_to_end(tmp_path):
    data = _fib_data()
    src = tmp_path / "fib.bin"
    hf2 = tmp_path / "fib.hf2"
    out = tmp_path / "fib.out"
    src.write_bytes(data.tobytes())
    # the device writer must take the length-limited route on its own
    read_compress_write_hf2(str(src), str(hf2), device=True,
                            block_len=65536)
    with open(hf2, "rb") as fp:
        hdr = read_hf2_header(fp)
    # container carries the LIMITED tree (<= 32) — proof the fallback fired
    # inside the writer, and the container stays reference-shaped
    assert hdr.tree.max_code_len() <= 32
    assert hdr.crcs is not None
    read_decompress_write_hf2(str(hf2), str(out))
    assert out.read_bytes() == data.tobytes()
    # quantify the real on-disk delta vs the unlimited host-tree container
    import os

    hf2_host = tmp_path / "fib_host.hf2"
    read_compress_write_hf2(str(src), str(hf2_host), device=False,
                            block_len=65536)
    with open(hf2_host, "rb") as fp:
        hhdr = read_hf2_header(fp)
    assert hhdr.tree.max_code_len() == N_SYMS - 1  # host keeps the optimum
    grow = os.path.getsize(hf2) / os.path.getsize(hf2_host) - 1
    assert grow < 0.001, f"device container {grow:.6%} larger"
    ohost = tmp_path / "fib_host.out"
    read_decompress_write_hf2(str(hf2_host), str(ohost))
    assert ohost.read_bytes() == data.tobytes()


def test_fib_hff_device_writer_falls_back(tmp_path):
    """The .hff --device writer must take the same 32-bit length-limit
    fallback as the .hf2 writer on deep trees (r5 fix: it previously
    raised OverflowError from make_encode_tables), while keeping
    byte-parity with the host writer on normal inputs."""
    from tpuhuff.io.stream import read_compress_write, read_decompress_write

    data = _fib_data()
    src = tmp_path / "f.bin"
    hff = tmp_path / "f.hff"
    out = tmp_path / "f.out"
    src.write_bytes(data.tobytes())
    read_compress_write(str(src), str(hff), device=True)
    read_decompress_write(str(hff), str(out), auto_index=False)
    assert out.read_bytes() == data.tobytes()
    # normal input: device and host writers emit identical bytes
    src.write_bytes(b"normal text input " * 3000)
    read_compress_write(str(src), str(hff), device=True)
    d1 = hff.read_bytes()
    read_compress_write(str(src), str(hff))
    assert d1 == hff.read_bytes()


def test_max_code_len_knob_hff_and_hf2(tmp_path):
    """--max-code-len (r5 speed/ratio knob): limited containers stay
    valid and decode exactly on both formats."""
    from tpuhuff.io.hff import read_hf2_header
    from tpuhuff.io.stream import (
        read_compress_write, read_compress_write_hf2,
        read_decompress_write, read_decompress_write_hf2,
    )

    data = _fib_data()
    src = tmp_path / "k.bin"
    src.write_bytes(data.tobytes())
    hff = tmp_path / "k.hff"
    read_compress_write(str(src), str(hff), max_code_len=12)
    out = tmp_path / "k.out"
    read_decompress_write(str(hff), str(out), auto_index=False)
    assert out.read_bytes() == data.tobytes()
    hf2 = tmp_path / "k.hf2"
    read_compress_write_hf2(str(src), str(hf2), max_code_len=12)
    with open(hf2, "rb") as fp:
        assert read_hf2_header(fp).tree.max_code_len() <= 12
    read_decompress_write_hf2(str(hf2), str(out))
    assert out.read_bytes() == data.tobytes()

"""Round-4 stream tests: auto-index sidecar + pipelined device file paths."""

import os

import numpy as np
import pytest

from tpuhuff.io.stream import (
    read_compress_write,
    read_compress_write_hf2,
    read_decompress_write,
    read_decompress_write_hf2,
)


def _data(n=200_000, seed=3):
    rng = np.random.default_rng(seed)
    text = b"the quick brown fox jumps over the lazy dog 0123456789 "
    base = np.frombuffer(text * (n // len(text) + 1), dtype=np.uint8)[:n]
    base = base.copy()
    idx = rng.integers(0, n, n // 32)
    base[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)
    return base


def test_auto_index_sidecar_roundtrip(tmp_path):
    pytest.importorskip("tpuhuff.native")
    from tpuhuff import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    data = _data()
    src = tmp_path / "a.bin"
    src.write_bytes(data.tobytes())
    hff = tmp_path / "a.hff"
    read_compress_write(str(src), str(hff))
    out = tmp_path / "a.out"
    stats = {}
    read_decompress_write(str(hff), str(out), auto_index=True, stats=stats)
    assert out.read_bytes() == data.tobytes()
    assert stats.get("auto_index") == "created"
    sidecar = str(hff) + ".hf2x"
    assert os.path.exists(sidecar)
    # second decode reuses the sidecar (block-parallel path)
    stats2 = {}
    out2 = tmp_path / "a2.out"
    read_decompress_write(str(hff), str(out2), auto_index=True, stats=stats2)
    assert out2.read_bytes() == data.tobytes()
    assert stats2.get("auto_index") == "reused"
    # stale sidecar (older than source) is rebuilt
    os.utime(sidecar, (1, 1))
    stats3 = {}
    read_decompress_write(str(hff), str(out2), auto_index=True, stats=stats3)
    assert stats3.get("auto_index") == "created"
    assert out2.read_bytes() == data.tobytes()


def test_auto_index_disabled_leaves_no_sidecar(tmp_path):
    data = _data(50_000)
    src = tmp_path / "b.bin"
    src.write_bytes(data.tobytes())
    hff = tmp_path / "b.hff"
    read_compress_write(str(src), str(hff))
    out = tmp_path / "b.out"
    read_decompress_write(str(hff), str(out), auto_index=False)
    assert out.read_bytes() == data.tobytes()
    assert not os.path.exists(str(hff) + ".hf2x")


def test_pipelined_device_hf2_roundtrip_multichunk(tmp_path):
    # chunk_bytes forces >= 4 pipelined chunks through submit/collect
    data = _data(300_000, seed=9)
    src = tmp_path / "c.bin"
    src.write_bytes(data.tobytes())
    hf2 = tmp_path / "c.hf2"
    read_compress_write_hf2(str(src), str(hf2), device=True,
                            chunk_bytes=64 * 1024, block_len=256)
    out = tmp_path / "c.out"
    read_decompress_write_hf2(str(hf2), str(out), device=True,
                              chunk_bytes=64 * 1024)
    assert out.read_bytes() == data.tobytes()
    # device writer output is byte-identical to the host writer's at equal
    # block_len (both canonicalize identically)
    hf2h = tmp_path / "ch.hf2"
    read_compress_write_hf2(str(src), str(hf2h), device=False, block_len=256)
    assert hf2.read_bytes() == hf2h.read_bytes()


def test_pipelined_device_hf2_tiny_and_ragged(tmp_path):
    for n in (1, 255, 257, 4096 + 13):
        data = _data(n, seed=n)
        src = tmp_path / f"t{n}.bin"
        src.write_bytes(data.tobytes())
        hf2 = tmp_path / f"t{n}.hf2"
        read_compress_write_hf2(str(src), str(hf2), device=True,
                                chunk_bytes=2048, block_len=256)
        out = tmp_path / f"t{n}.out"
        read_decompress_write_hf2(str(hf2), str(out), device=True)
        assert out.read_bytes() == data.tobytes(), n


def test_cli_no_auto_index_flag(tmp_path, monkeypatch):
    from tpuhuff.cli.main import main

    data = _data(40_000)
    src = tmp_path / "d.bin"
    src.write_bytes(data.tobytes())
    monkeypatch.chdir(tmp_path)
    assert main(["-n", "d.bin"]) == 0
    assert main(["-d", "-n", "--no-auto-index", "d.bin.hff", "d.out"]) == 0
    assert (tmp_path / "d.out").read_bytes() == data.tobytes()
    assert not os.path.exists(str(tmp_path / "d.bin.hff.hf2x"))


def test_hist_sample_fast_mode_exact_roundtrip(tmp_path):
    # sampled+smoothed tree: output must stay EXACTLY decodable; ratio
    # degrades only marginally on stationary data
    data = _data(400_000, seed=21)
    src = tmp_path / "s.bin"
    src.write_bytes(data.tobytes())
    full = tmp_path / "full.hf2"
    samp = tmp_path / "samp.hf2"
    read_compress_write_hf2(str(src), str(full))
    read_compress_write_hf2(str(src), str(samp), hist_sample=8,
                            chunk_bytes=32 * 1024)
    out = tmp_path / "s.out"
    read_decompress_write_hf2(str(samp), str(out))
    assert out.read_bytes() == data.tobytes()
    ratio = os.path.getsize(samp) / os.path.getsize(full)
    assert ratio < 1.02, ratio  # < 2% worse on this corpus


def test_hist_sample_covers_unsampled_bytes(tmp_path):
    # a byte value that appears ONLY outside the sampled prefixes still
    # round-trips (the Laplace smoothing guarantees it has a code)
    n = 64 * 1024
    data = np.zeros(n, np.uint8)
    data[:] = 65
    data[-7:] = 255  # never in any sampled prefix at hist_sample=8
    src = tmp_path / "c.bin"
    src.write_bytes(data.tobytes())
    hf2 = tmp_path / "c.hf2"
    read_compress_write_hf2(str(src), str(hf2), hist_sample=8,
                            chunk_bytes=16 * 1024)
    out = tmp_path / "c.out"
    read_decompress_write_hf2(str(hf2), str(out))
    assert out.read_bytes() == data.tobytes()


def test_hist_sample_device_roundtrip(tmp_path):
    data = _data(200_000, seed=22)
    src = tmp_path / "d.bin"
    src.write_bytes(data.tobytes())
    hf2 = tmp_path / "d.hf2"
    read_compress_write_hf2(str(src), str(hf2), device=True, hist_sample=4,
                            chunk_bytes=64 * 1024, block_len=256)
    out = tmp_path / "d.out"
    read_decompress_write_hf2(str(hf2), str(out), device=True)
    assert out.read_bytes() == data.tobytes()


def test_auto_index_detects_content_replacement(tmp_path):
    # timestamp-preserving replacement (cp -p / rsync -t) must NOT serve
    # the previous file's contents from the sidecar (review r4 #1)
    pytest.importorskip("tpuhuff.native")
    from tpuhuff import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    d1 = _data(150_000, seed=31)
    d2 = _data(150_000, seed=32)
    src = tmp_path / "r.bin"
    hff = tmp_path / "r.hff"
    out = tmp_path / "r.out"
    src.write_bytes(d1.tobytes())
    read_compress_write(str(src), str(hff))
    read_decompress_write(str(hff), str(out), auto_index=True)
    sidecar = str(hff) + ".hf2x"
    assert os.path.exists(sidecar)
    # replace the source .hff with one for different content, preserving
    # an older mtime than the sidecar's
    src.write_bytes(d2.tobytes())
    hff2 = tmp_path / "r2.hff"
    read_compress_write(str(src), str(hff2))
    st = os.stat(sidecar)
    os.replace(str(hff2), str(hff))
    os.utime(str(hff), (st.st_atime - 10, st.st_mtime - 10))
    stats = {}
    read_decompress_write(str(hff), str(out), auto_index=True, stats=stats)
    assert out.read_bytes() == d2.tobytes()  # NOT d1
    assert stats.get("auto_index") == "created"  # rebuilt, not reused


def test_auto_index_corrupt_sidecar_falls_back(tmp_path):
    pytest.importorskip("tpuhuff.native")
    from tpuhuff import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    data = _data(120_000, seed=33)
    src = tmp_path / "p.bin"
    hff = tmp_path / "p.hff"
    out = tmp_path / "p.out"
    src.write_bytes(data.tobytes())
    read_compress_write(str(src), str(hff))
    read_decompress_write(str(hff), str(out), auto_index=True)
    sidecar = str(hff) + ".hf2x"
    # corrupt the sidecar in place (garbage header), keep it "fresh"
    with open(sidecar, "r+b") as f:
        f.write(b"\xff" * 64)
    stats = {}
    read_decompress_write(str(hff), str(out), auto_index=True, stats=stats)
    assert out.read_bytes() == data.tobytes()
    # either rebuilt (content check caught it) or serial fallback — both
    # are correct; silent stale output is the only failure mode
    assert stats.get("auto_index") in ("created", "failed")


def test_hist_sample_hff_path(tmp_path):
    data = _data(100_000, seed=34)
    src = tmp_path / "h.bin"
    hff = tmp_path / "h.hff"
    out = tmp_path / "h.out"
    src.write_bytes(data.tobytes())
    read_compress_write(str(src), str(hff), hist_sample=8)
    read_decompress_write(str(hff), str(out), auto_index=False)
    assert out.read_bytes() == data.tobytes()


def test_malformed_hf2_table_rejected(tmp_path):
    # non-monotonic block table must raise InvalidHeaderInfo, not feed
    # negative read lengths into the group loop
    import struct

    from tpuhuff.io.stream import StreamError

    data = _data(4096, seed=41)
    src = tmp_path / "m.bin"
    src.write_bytes(data.tobytes())
    hf2 = tmp_path / "m.hf2"
    read_compress_write_hf2(str(src), str(hf2), block_len=256)
    raw = bytearray(hf2.read_bytes())
    # v2 layout: magic4 flags1 width1 treelen4 pad1 orig8 block4 nblocks4
    width = raw[5]
    table_off = 27
    # swap the first two table entries after inflating the first: makes
    # cumulative ends non-monotonic
    e0 = int.from_bytes(raw[table_off:table_off + width], "big")
    big = (1 << (8 * width)) - 1
    raw[table_off:table_off + width] = big.to_bytes(width, "big")
    raw[table_off + width:table_off + 2 * width] = e0.to_bytes(width, "big")
    bad = tmp_path / "bad.hf2"
    bad.write_bytes(bytes(raw))
    out = tmp_path / "m.out"
    try:
        read_decompress_write_hf2(str(bad), str(out))
    except (StreamError, ValueError):
        pass  # any typed rejection is fine
    else:
        # if it "succeeded", the output must NOT silently be wrong size
        assert os.path.getsize(out) == data.size

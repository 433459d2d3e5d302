"""CLI tests: flag compatibility with the reference `huff` binary."""

import os

import numpy as np
import pytest

from tpuhuff.cli.main import CliError, main, parse_block_size


def test_parse_block_size():
    # huff/src/cli.rs:79-114
    assert parse_block_size("2G") == 2_000_000_000
    assert parse_block_size("2g") == 2_000_000_000
    assert parse_block_size("1k") == 1000
    assert parse_block_size("3M") == 3_000_000
    assert parse_block_size("1Ki") == 1024
    assert parse_block_size("2Mi") == 2_097_152
    assert parse_block_size("1Gi") == 1_073_741_824
    assert parse_block_size("123") == 123
    for bad in ("0", "x", "1X", "", "1kk"):
        with pytest.raises(CliError):
            parse_block_size(bad)


def _run(argv):
    return main(argv)


def test_cli_compress_decompress(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = np.random.default_rng(0).integers(0, 99, 10_000, dtype=np.uint8).tobytes()
    (tmp_path / "file.bin").write_bytes(data)
    assert _run(["-n", "file.bin"]) == 0
    assert (tmp_path / "file.bin.hff").exists()
    assert _run(["-d", "-n", "file.bin.hff", "out.bin"]) == 0
    assert (tmp_path / "out.bin").read_bytes() == data


def test_cli_default_dst_appends_hff(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "data.txt").write_bytes(b"some text some text")
    assert _run(["-n", "data.txt"]) == 0
    # cli.rs:40-54 — extension appended after the existing one
    assert (tmp_path / "data.txt.hff").exists()


def test_cli_decompress_strips_extension(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "x.bin").write_bytes(b"roundtrip me please!")
    assert _run(["-n", "x.bin"]) == 0
    assert _run(["-d", "-n", "x.bin.hff"]) == 0
    assert (tmp_path / "x.bin").read_bytes() == b"roundtrip me please!"


def test_cli_decompress_requires_hff_ext(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "y.zip").write_bytes(b"data")
    assert _run(["-d", "-n", "y.zip"]) == 1  # UnrecognizedFormat


def test_cli_replace_deletes_source(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "z.bin").write_bytes(b"delete me after compression")
    assert _run(["-n", "-r", "z.bin"]) == 0
    assert not (tmp_path / "z.bin").exists()
    assert (tmp_path / "z.bin.hff").exists()


def test_cli_src_directory_error(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.mkdir(tmp_path / "adir")
    assert _run(["-n", "adir"]) == 1


def test_cli_time_and_stats(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "t.bin").write_bytes(b"abcabcabc" * 100)
    assert _run(["-n", "-t", "--stats", "t.bin"]) == 0
    out = capsys.readouterr().out
    assert "ratio" in out and "s\n" in out


def test_cli_hf2_flow(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data = np.random.default_rng(1).integers(0, 30, 50_000, dtype=np.uint8).tobytes()
    (tmp_path / "p.bin").write_bytes(data)
    assert _run(["-n", "--hf2", "p.bin"]) == 0
    assert (tmp_path / "p.bin.hf2").exists()
    assert _run(["-d", "-n", "--hf2", "p.bin.hf2", "q.bin"]) == 0
    assert (tmp_path / "q.bin").read_bytes() == data


def test_cli_overwrite_prompt_refusal(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "w.bin").write_bytes(b"www")
    (tmp_path / "w.bin.hff").write_bytes(b"existing")
    import io as _io

    monkeypatch.setattr("sys.stdin", _io.StringIO("no\n"))
    assert _run(["w.bin"]) == 0
    # refused: existing file untouched
    assert (tmp_path / "w.bin.hff").read_bytes() == b"existing"
    monkeypatch.setattr("sys.stdin", _io.StringIO("y\n"))
    assert _run(["w.bin"]) == 0
    assert (tmp_path / "w.bin.hff").read_bytes() != b"existing"


def test_cli_stats_with_replace_reports_true_ratio(tmp_path, monkeypatch, capsys):
    # VERDICT r1 weak #7: -r --stats used to read in_size from dst
    monkeypatch.chdir(tmp_path)
    data = bytes(1000) + b"ab" * 500
    (tmp_path / "f.bin").write_bytes(data)
    assert _run(["-n", "-r", "--stats", "f.bin"]) == 0
    out = capsys.readouterr().out
    assert f"{len(data)} ->" in out
    ratio = float(out.split("ratio ")[1].split(")")[0])
    assert ratio < 0.9  # compressible input: ratio must not read as ~1.0


def test_cli_reindex_hff_to_hf2(tmp_path, monkeypatch):
    from tpuhuff import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    monkeypatch.chdir(tmp_path)
    data = np.random.default_rng(3).integers(0, 150, 40_000,
                                             dtype=np.uint8).tobytes()
    (tmp_path / "f.bin").write_bytes(data)
    assert _run(["-n", "f.bin"]) == 0
    assert _run(["--reindex", "-n", "--hf2-block", "1Ki", "f.bin.hff"]) == 0
    assert (tmp_path / "f.bin.hf2").exists()
    assert _run(["-d", "-n", "--hf2", "f.bin.hf2", "out.bin"]) == 0
    assert (tmp_path / "out.bin").read_bytes() == data

"""True multi-process multihost test (config 5 shape, CPU backend).

Two OS processes join a ``jax.distributed`` cluster (coordinator on
localhost), each with 4 virtual CPU devices; each compresses its own byte
range of a shared file; process 0 writes the ``.hf2``; the test then
decodes it single-process and compares.  This exercises the real DCN-shaped
path: global-array construction, cross-process psum histogram, sharded
pack, ordered allgather — not the single-process degenerate mode.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import os, sys
sys.path.insert(0, os.environ["TPUHUFF_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
# exercise the product entry point (env-var driven), not raw
# jax.distributed.initialize — r4 review: the old process_count() probe
# initialized the backend and made initialization impossible
os.environ["TPUHUFF_COORDINATOR"] = os.environ["TPUHUFF_COORD"]
os.environ["TPUHUFF_NUM_PROCESSES"] = os.environ["TPUHUFF_NPROC"]
os.environ["TPUHUFF_PROCESS_ID"] = os.environ["TPUHUFF_PID"]
from tpuhuff.dist.multihost import initialize
initialize()
initialize()  # second call must no-op (already initialized), not raise
assert jax.process_count() == int(os.environ["TPUHUFF_NPROC"])
assert jax.device_count() == int(os.environ.get("TPUHUFF_NDEV", "8")), (
    jax.device_count()
)
from tpuhuff.dist.multihost import (
    compress_file_multihost, decompress_file_multihost,
)
chunk = os.environ.get("TPUHUFF_CHUNK")
compress_file_multihost(os.environ["TPUHUFF_SRC"], os.environ["TPUHUFF_DST"],
                        block_len=int(os.environ["TPUHUFF_BLOCK"]),
                        chunk_bytes=int(chunk) if chunk else None)
# decode side (config 5): every process decodes its own block range
decompress_file_multihost(os.environ["TPUHUFF_DST"], os.environ["TPUHUFF_RT"],
                          device=True)
print("proc", jax.process_index(), "OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_hf2_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    text = (b"multi host huffman " * 977)[: 11 * 4096 + 123]
    noise = rng.integers(0, 256, len(text), dtype=np.uint8)
    data = bytes(np.where(rng.random(len(text)) < 0.05,
                          noise, np.frombuffer(text, np.uint8)).astype(np.uint8))
    src = tmp_path / "src.bin"
    dst = tmp_path / "out.hf2"
    src.write_bytes(data)

    port = _free_port()
    env_base = dict(
        os.environ,
        TPUHUFF_REPO=REPO,
        TPUHUFF_COORD=f"127.0.0.1:{port}",
        TPUHUFF_NPROC="2",
        TPUHUFF_SRC=str(src),
        TPUHUFF_DST=str(dst),
        TPUHUFF_RT=str(tmp_path / "mh_roundtrip.bin"),
        TPUHUFF_BLOCK="4096",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = []
    for pid in (0, 1):
        env = dict(env_base, TPUHUFF_PID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _DRIVER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out

    from tpuhuff.io.stream import read_decompress_write_hf2

    out_file = tmp_path / "roundtrip.bin"
    read_decompress_write_hf2(str(dst), str(out_file))
    assert out_file.read_bytes() == data
    # the two-process parallel decode must agree byte-for-byte too
    assert (tmp_path / "mh_roundtrip.bin").read_bytes() == data


def test_three_process_multi_round_hf2(tmp_path):
    """3 processes, tiny super-chunks forcing >1 round-robin round per host
    (VERDICT r2 next #9): the ordered coordinator write must interleave
    rounds correctly, and every process's pwrite-sharded decode must agree."""
    rng = np.random.default_rng(11)
    # 29 blocks of 1024 (+ ragged tail) over 3 procs, super-chunks of 4
    # blocks -> 8 super-chunks -> 3 rounds, last round partially filled
    data = rng.integers(0, 200, 29 * 1024 + 301, dtype=np.uint8).tobytes()
    src = tmp_path / "src3.bin"
    dst = tmp_path / "out3.hf2"
    src.write_bytes(data)

    port = _free_port()
    env_base = dict(
        os.environ,
        TPUHUFF_REPO=REPO,
        TPUHUFF_COORD=f"127.0.0.1:{port}",
        TPUHUFF_NPROC="3",
        TPUHUFF_NDEV="6",
        TPUHUFF_SRC=str(src),
        TPUHUFF_DST=str(dst),
        TPUHUFF_RT=str(tmp_path / "mh3_roundtrip.bin"),
        TPUHUFF_BLOCK="1024",
        TPUHUFF_CHUNK=str(4 * 1024),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    procs = []
    for pid in (0, 1, 2):
        env = dict(env_base, TPUHUFF_PID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _DRIVER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out

    from tpuhuff.io.stream import read_decompress_write_hf2

    out_file = tmp_path / "roundtrip3.bin"
    read_decompress_write_hf2(str(dst), str(out_file))
    assert out_file.read_bytes() == data
    assert (tmp_path / "mh3_roundtrip.bin").read_bytes() == data
    # byte-identical to the single-process writer at the same settings
    from tpuhuff.dist.multihost import compress_file_multihost

    single = tmp_path / "single3.hf2"
    compress_file_multihost(str(src), str(single), block_len=1024,
                            chunk_bytes=4 * 1024)
    assert single.read_bytes() == dst.read_bytes()


def test_multihost_output_equals_single_process(tmp_path):
    """The round-robin streaming writer must produce the same .hf2 bytes
    regardless of process count (ordered coordinator write)."""
    from tpuhuff.dist.multihost import compress_file_multihost
    from tpuhuff.io.stream import read_compress_write_hf2

    rng = np.random.default_rng(5)
    data = rng.integers(0, 99, 37_777, dtype=np.uint8).tobytes()
    src = tmp_path / "s.bin"
    src.write_bytes(data)
    a = tmp_path / "single.hf2"
    b = tmp_path / "mh1.hf2"
    # single process multihost (nproc=1) vs the plain streaming writer with
    # the same device-limited tree settings + tiny chunks (many rounds)
    compress_file_multihost(str(src), str(b), block_len=1024,
                            chunk_bytes=4096)
    read_compress_write_hf2(str(src), str(a), block_len=1024, device=True)
    assert a.read_bytes() == b.read_bytes()

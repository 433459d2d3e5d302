"""Config-5 structural scale evidence (VERDICT r4 #6): 4 processes,
>= 256 MB total, UNEVEN host shards, encode + decode sides, CRC column
built distributedly (crc32_combine folding) and verified on decode.

The aggregate-GB/s scaling table (N = 1/2/4 processes, CPU backend) lives
in PERF_NOTES.md "Round 5"; this test pins the structure in CI at the same
shape.  2 vCPUs cap *speed*, not structure — what is asserted here is
correctness of the 4-way round-robin ordered write, the distributed CRC
fold, the uneven final shard, and the 4-way pwrite-sharded decode.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import os, sys, time
sys.path.insert(0, os.environ["TPUHUFF_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["TPUHUFF_COORDINATOR"] = os.environ["TPUHUFF_COORD"]
os.environ["TPUHUFF_NUM_PROCESSES"] = os.environ["TPUHUFF_NPROC"]
os.environ["TPUHUFF_PROCESS_ID"] = os.environ["TPUHUFF_PID"]
from tpuhuff.dist.multihost import initialize
initialize()
from tpuhuff.dist.multihost import (
    compress_file_multihost, decompress_file_multihost,
)
t0 = time.time()
compress_file_multihost(os.environ["TPUHUFF_SRC"], os.environ["TPUHUFF_DST"],
                        block_len=int(os.environ["TPUHUFF_BLOCK"]))
t1 = time.time()
decompress_file_multihost(os.environ["TPUHUFF_DST"], os.environ["TPUHUFF_RT"],
                          device=False)  # threaded DFA decode side
t2 = time.time()
print(f"proc {jax.process_index()} OK enc={t1-t0:.1f}s dec={t2-t1:.1f}s",
      flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_four_process_256mb_uneven(tmp_path):
    rng = np.random.default_rng(0)
    # 256 MiB + a ragged tail: 4133 full blocks of 64 KiB + a partial ->
    # 4134 blocks; per-host quota ceil(4134/4) = 1034, so host 3 owns only
    # 1032 (the last one partial) — uneven shards by construction
    n = (256 << 20) + 37 * 65536 + 12345
    text = (b"the quick brown fox jumps over the lazy dog 0123456789 "
            * (n // 55 + 1))[:n]
    data = bytearray(text)
    idx = rng.integers(0, n, n // 256)
    vals = rng.integers(0, 256, idx.size, dtype=np.uint8)
    for i, v in zip(idx, vals):
        data[int(i)] = int(v)
    data = bytes(data)
    src = tmp_path / "big.bin"
    dst = tmp_path / "big.hf2"
    rt = tmp_path / "big.rt"
    src.write_bytes(data)

    port = _free_port()
    env_base = dict(
        os.environ,
        TPUHUFF_REPO=REPO,
        TPUHUFF_COORD=f"127.0.0.1:{port}",
        TPUHUFF_NPROC="4",
        TPUHUFF_SRC=str(src),
        TPUHUFF_DST=str(dst),
        TPUHUFF_RT=str(rt),
        TPUHUFF_BLOCK="65536",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    procs = []
    for pid in range(4):
        env = dict(env_base, TPUHUFF_PID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _DRIVER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out

    # the 4-process pwrite-sharded decode agrees byte-for-byte
    assert rt.read_bytes() == data
    # the distributed CRC column exists and a single-process decode
    # verifies it end to end
    from tpuhuff.io.hff import read_hf2_header
    from tpuhuff.io.stream import read_decompress_write_hf2

    with open(dst, "rb") as fp:
        hdr = read_hf2_header(fp)
    assert hdr.crcs is not None and hdr.crc_every == 1
    assert hdr.crcs.size == hdr.num_blocks == 4134
    single = tmp_path / "single.rt"
    read_decompress_write_hf2(str(dst), str(single))
    assert single.read_bytes() == data

"""Config-5 scaling table (PERF_NOTES r5): aggregate GB/s of
compress_file_multihost / decompress_file_multihost at N = 1/2/4 processes,
CPU backend, 256 MiB + ragged tail, uneven shards.

Run: env -u PALLAS_AXON_POOL_IPS python experiments/r5_mh_scaling.py
NOTE: the dev box has 2 vCPUs — N=4 measures oversubscription, not
speedup; the table documents structure + the real 2-core ceiling.
"""

import os
import socket
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import os, sys, time
sys.path.insert(0, os.environ["TPUHUFF_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["TPUHUFF_COORDINATOR"] = os.environ["TPUHUFF_COORD"]
os.environ["TPUHUFF_NUM_PROCESSES"] = os.environ["TPUHUFF_NPROC"]
os.environ["TPUHUFF_PROCESS_ID"] = os.environ["TPUHUFF_PID"]
from tpuhuff.dist.multihost import (initialize, compress_file_multihost,
                                    decompress_file_multihost)
initialize()
t0 = time.time()
compress_file_multihost(os.environ["TPUHUFF_SRC"], os.environ["TPUHUFF_DST"])
t1 = time.time()
decompress_file_multihost(os.environ["TPUHUFF_DST"], os.environ["TPUHUFF_RT"],
                          device=False)
t2 = time.time()
print(f"TIMES {jax.process_index()} {t1-t0:.3f} {t2-t1:.3f}", flush=True)
"""


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def run(nproc, src, dst, rt):
    env_base = dict(
        os.environ, TPUHUFF_REPO=REPO,
        TPUHUFF_COORD=f"127.0.0.1:{free_port()}",
        TPUHUFF_NPROC=str(nproc), TPUHUFF_SRC=src, TPUHUFF_DST=dst,
        TPUHUFF_RT=rt, JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    env_base.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen([sys.executable, "-c", DRIVER],
                              env=dict(env_base, TPUHUFF_PID=str(k)),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for k in range(nproc)]
    encs, decs = [], []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        txt = out.decode(errors="replace")
        assert p.returncode == 0, txt[-2000:]
        for line in txt.splitlines():
            if line.startswith("TIMES"):
                _, _, e, d = line.split()
                encs.append(float(e))
                decs.append(float(d))
    return max(encs), max(decs)


def main():
    rng = np.random.default_rng(0)
    n = (256 << 20) + 37 * 65536 + 12345
    text = (b"the quick brown fox jumps over the lazy dog 0123456789 "
            * (n // 55 + 1))[:n]
    data = bytearray(text)
    idx = rng.integers(0, n, n // 256)
    vals = rng.integers(0, 256, idx.size, dtype=np.uint8)
    for i, v in zip(idx, vals):
        data[int(i)] = int(v)
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "s.bin")
        with open(src, "wb") as f:
            f.write(bytes(data))
        print(f"file: {n / 1e6:.1f} MB, host cores: {os.cpu_count()}")
        for nproc in (1, 2, 4):
            dst = os.path.join(td, f"o{nproc}.hf2")
            rt = os.path.join(td, f"r{nproc}.bin")
            t0 = time.time()
            enc, dec = run(nproc, src, dst, rt)
            wall = time.time() - t0
            with open(rt, "rb") as f:
                assert f.read() == bytes(data), "roundtrip mismatch"
            print(f"N={nproc}: encode {enc:.2f}s ({n / enc / 1e9:.3f} GB/s "
                  f"agg), decode {dec:.2f}s ({n / dec / 1e9:.3f} GB/s agg), "
                  f"wall {wall:.1f}s")


if __name__ == "__main__":
    main()

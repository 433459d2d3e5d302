"""r4 session 4 — chunk-pipeline structure microbench (VERDICT r3 #5).

Shows the double-buffered submit/collect structure of the r4 device file
paths overlaps host work with device compute: wall(pipelined) ~=
max(sum_device, sum_host) while wall(sequential) ~= sum_device +
sum_host.  Chunks are device-resident (no file/relay in the loop) so the
measurement isolates the STRUCTURE; on this rig the real file path stays
relay-bound (~5-10 MB/s H2D) — honest in BENCH extra — but the same code
sustains kernel rate wherever the host side keeps up.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuhuff.cache import enable_compile_cache
enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from tpuhuff.core.canonical import canonicalize
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels import encode as kenc
from tpuhuff.kernels import pallas_encode2 as pe2

CHUNK_MB = 16
CHUNKS = 8
N = 256


def log(*a):
    print(*a, flush=True)


def host_work(ms: float):
    """Stand-in for the per-chunk host stitch/write (busy numpy)."""
    t0 = time.perf_counter()
    x = np.arange(1 << 14)
    while time.perf_counter() - t0 < ms / 1e3:
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return int(x[0])


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    rng = np.random.default_rng(0)
    n = CHUNK_MB << 20
    B = n // N
    tree_src = rng.integers(0, 200, 1 << 20, dtype=np.uint8)
    tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(tree_src)))
    tabs = kenc.make_canonical_encode_tables(tree)
    ML = tabs[4]
    chunks = [jax.device_put(
        jnp.asarray(rng.integers(0, 200, (B, N), dtype=np.uint8)), dev)
        for _ in range(CHUNKS)]
    for c in chunks:
        c.block_until_ready()

    def submit(c, salt):
        valid = jnp.full(B, N, jnp.int32).at[B - 1].set(N - salt)
        return pe2.encode_blocks_pallas2(c, tabs[:4], ML, valid_lens=valid,
                                         full_alphabet=bool(tabs[5]))

    # warm up the compile
    w, b = submit(chunks[0], 0)
    w.block_until_ready()

    # pure device rate for reference
    t0 = time.perf_counter()
    for r in range(2):
        for i, c in enumerate(chunks):
            w, b = submit(c, (r + i) & 1)
        w.block_until_ready()
    dev_s = (time.perf_counter() - t0) / 2
    log(f"pure device: {dev_s*1e3:.1f} ms/{CHUNKS} chunks "
        f"({CHUNKS*n/dev_s/1e9:.2f} GB/s)")

    for hw_ms in (2.0, 5.0, 20.0):
        seq_s = pipe_s = float("inf")
        for rep in range(4):  # best-of-4: the relay stalls sporadically
            # sequential: sync each chunk, then host work
            t0 = time.perf_counter()
            for i, c in enumerate(chunks):
                w, b = submit(c, (rep + i) & 1)
                np.asarray(b)  # sync (bits only: tiny D2H on the relay)
                host_work(hw_ms)
            seq_s = min(seq_s, time.perf_counter() - t0)
            # pipelined: submit chunk k+1 before syncing chunk k
            t0 = time.perf_counter()
            pending = None
            for i in range(CHUNKS + 1):
                handle = (submit(chunks[i], ((rep + i) & 1) ^ 1)
                          if i < CHUNKS else None)
                if pending is not None:
                    np.asarray(pending[1])
                    host_work(hw_ms)
                pending = handle
            pipe_s = min(pipe_s, time.perf_counter() - t0)
        log(f"host={hw_ms:.0f}ms/chunk: sequential {seq_s*1e3:.1f} ms, "
            f"pipelined {pipe_s*1e3:.1f} ms "
            f"(ideal max-bound {max(dev_s, CHUNKS*hw_ms/1e3)*1e3:.1f}, "
            f"sum-bound {(dev_s + CHUNKS*hw_ms/1e3)*1e3:.1f})")


if __name__ == "__main__":
    main()

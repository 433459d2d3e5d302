"""r5: encode G re-sweep (same-session A/B — r4 measured G=8 +4% over
G=4 but the decode re-sweep showed r4 cross-session drift of the same
size; settle it within ONE session)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuhuff.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from tpuhuff.core.canonical import canonicalize
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels import pallas_encode2 as pe2
from tpuhuff.kernels.encode import (
    make_canonical_encode_tables, make_encode_tables,
)
from tpuhuff.kernels.pallas_encode2 import encode_blocks_pallas2

MB = int(os.environ.get("BENCH_MB", "100"))
LANE = 256
K1, K2, REPS = 2, 32, 5


def make_textlike(n):
    rng = np.random.default_rng(42)
    text = (
        b"the of and to in a is that it was for on are as with his they at "
        b"<page><title>Benchmark</title><revision><text xml:space=\"preserve\">"
        b"In information theory, a Huffman code is a particular type of optimal "
        b"prefix code that is commonly used for lossless data compression. "
    )
    base = np.frombuffer(text * (n // len(text) + 1), dtype=np.uint8)[:n].copy()
    idx = rng.integers(0, n, n // 64)
    base[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)
    return base


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = MB << 20
    data = make_textlike(n)
    B = n // LANE
    tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
    dl, da = make_encode_tables(*tree.encode_tables())
    tabs = make_canonical_encode_tables(tree)
    t4 = tuple(tabs[:4])
    ml, full = tabs[4], tabs[5]
    jl = jax.device_put(jnp.asarray(data.reshape(B, LANE)))
    jl.block_until_ready()

    def consume(words):
        wb = jax.lax.bitcast_convert_type(words[..., None], jnp.uint8)
        return jnp.sum(wb.astype(jnp.int32)) & 0xFFFF

    results = {}
    for G in (2, 4, 8):
        pe2.ENC_GROUPS = G
        jax.clear_caches()

        @jax.jit
        def run(b, K):
            def body(i, acc):
                valid = jnp.full(B, LANE, jnp.int32).at[B - 1].set(
                    LANE - (i & 1))
                w, bits = encode_blocks_pallas2(b, t4, ml, valid,
                                                full_alphabet=full)
                return (acc + jnp.sum(bits) + consume(w)).astype(
                    jnp.int32) & 0xFFFF
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        times = {}
        compile_s = 0.0
        for K in (K1, K2):
            t0 = time.time()
            int(run(jl, K))
            compile_s += time.time() - t0
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                int(run(jl, K))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        per = (times[K2] - times[K1]) / (K2 - K1)
        gbps = n / max(per, 1e-9) / 1e9
        log(f"G={G}: {per*1e3:.2f} ms/iter -> {gbps:.2f} GB/s "
            f"(compile+first {compile_s:.1f}s)")
        results[G] = round(gbps, 3)
    print(results)


if __name__ == "__main__":
    main()

"""r4 session 6 — bf16-compare hist retry (i32-hop cast) + final two-pass."""

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
from tpuhuff.kernels.pallas_histogram import histogram_pallas

MB = 100
N = 256
K1, K2, REPS = 2, 16, 3


def log(*a):
    print(*a, flush=True)


def make_textlike(n):
    rng = np.random.default_rng(42)
    text = (b"the of and to in a is that it was for on are as with his they at "
            b"<page><title>Benchmark</title><revision><text xml:space=\"preserve\">"
            b"In information theory, a Huffman code is a particular type of optimal "
            b"prefix code that is commonly used for lossless data compression. ")
    base = np.frombuffer(text * (n // len(text) + 1), dtype=np.uint8)[:n].copy()
    idx = rng.integers(0, n, n // 64)
    base[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)
    return base


def kslope(run, arg, label):
    times = {}
    for K in (K1, K2):
        t0 = time.time()
        int(run(arg, K))
        log(f"  {label} K={K}: compile+first {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            int(run(arg, K))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[K2] - times[K1]) / (K2 - K1)


def consume_words(words):
    b = jax.lax.bitcast_convert_type(words[..., None], jnp.uint8)
    return jnp.sum(b.astype(jnp.int32)) & 0xFFFF


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    n = MB << 20
    data = make_textlike(n)
    B = n // N
    tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
    tabs = kenc.make_canonical_encode_tables(tree)
    canon, full, ML = tabs[:4], bool(tabs[5]), tabs[4]
    jl = jax.device_put(jnp.asarray(data.reshape(B, N)), dev)
    jl.block_until_ready()
    href = np.bincount(data, minlength=256)

    def hist_make(bf):
        @jax.jit
        def run(b, K):
            def body(i, acc):
                h = histogram_pallas(b ^ (i & 255).astype(jnp.uint8),
                                     G=8, bf16cmp=bf)
                return (acc + h[0]).astype(jnp.int32) & 0xFFFF
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    bf_ok = False
    try:
        hg = np.asarray(histogram_pallas(jl, G=8, bf16cmp=True))
        assert np.array_equal(hg, href), "bf16cmp mismatch"
        per = kslope(hist_make(True), jl, "hist bf16cmp")
        log(f"hist G=8 bf16cmp: exact, {per*1e3:.2f} ms -> "
            f"{n/per/1e9:.2f} GB/s")
        bf_ok = True
    except Exception as e:
        log(f"hist bf16cmp: FAILED {type(e).__name__}: {e}")

    if bf_ok:
        pe2.ENC_TOUT = True
        pe2.ENC_GROUPS = 8

        @jax.jit
        def run(b, K):
            def body(i, acc):
                valid = jnp.full(B, N, jnp.int32).at[B - 1].set(N - (i & 1))
                w, bl = pe2.encode_blocks_pallas2(
                    b, canon, ML, valid_lens=valid, full_alphabet=full)
                h = histogram_pallas(b ^ (i & 255).astype(jnp.uint8),
                                     G=8, bf16cmp=True)
                return (acc + consume_words(w) + jnp.sum(bl) + h[0]
                        ).astype(jnp.int32) & 0xFFFF
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        try:
            per = kslope(run, jl, "two-pass G8+bf16hist")
            log(f"two-pass G8 + bf16 hist: {per*1e3:.2f} ms -> "
                f"{n/per/1e9:.2f} GB/s")
        except Exception as e:
            log(f"two-pass bf16: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

"""Round-3 session 1: cell-major encode A/B (16 MiB vs 100 MiB) + histogram
dtype shootout (resolve the PERF_NOTES int8 contradiction, VERDICT weak #4).

Run:  python experiments/tpu_r3_s1.py 2>&1 | tee experiments/r3_s1.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpuhuff.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from tpuhuff.core.canonical import canonicalize
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels.encode import make_canonical_encode_tables, make_encode_tables

K1, K2, REPS = 2, 16, 4


def log(*a):
    print(*a, flush=True)


def make_textlike(n: int) -> np.ndarray:
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


def kslope(make, arg, label):
    times = {}
    for K in (K1, K2):
        f = make(K)
        t0 = time.time()
        int(f(arg))
        log(f"  {label} K={K}: compile+first {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            int(f(arg))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    per = (times[K2] - times[K1]) / (K2 - K1)
    return per


def bench_encode(n_mb, cell: bool):
    os.environ["TPUHUFF_ENC_CELL"] = "1" if cell else "0"
    # the env var is read at trace time inside encode_blocks_pallas2 and is
    # NOT part of any jit cache key — bust the traces so the A/B is real
    jax.clear_caches()
    from tpuhuff.kernels.encode import encode_blocks

    n = n_mb << 20
    data = make_textlike(n)
    LANE = 256
    B = n // LANE
    tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
    lens_lut, codes_lut = tree.encode_tables()
    dl, da = make_encode_tables(lens_lut, codes_lut)
    canon = make_canonical_encode_tables(tree)
    canon_tabs = canon[:4]
    full_alpha = bool(canon[5])
    ML = int(lens_lut.max())
    jlanes = jax.device_put(jnp.asarray(data.reshape(B, LANE)))
    jlanes.block_until_ready()

    def make(K):
        @jax.jit
        def run(b):
            def body(i, acc):
                rolled = jnp.roll(b, i, axis=0)
                words, bits = encode_blocks(
                    rolled, dl, da, max_code_len=ML,
                    canon_tables=canon_tabs, full_alphabet=full_alpha)
                return acc + (jnp.sum(bits).astype(jnp.int32) & 0xFFFF)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    per = kslope(make, jlanes, f"enc[{n_mb}MiB cell={cell}]")
    gbps = n / max(per, 1e-9) / 1e9
    log(f"encode {n_mb}MiB cell={cell}: {per*1e3:.2f} ms -> {gbps:.2f} GB/s")
    return gbps


def bench_hist(n_mb, variant):
    n = n_mb << 20
    data = make_textlike(n)
    jdata = jax.device_put(jnp.asarray(data))
    jdata.block_until_ready()
    CHUNK = 1 << 22

    def hist_chunk(chunk):
        hi = (chunk >> 4).astype(jnp.int32)
        lo = (chunk & 15).astype(jnp.int32)
        iota = jnp.arange(16, dtype=jnp.int32)
        if variant == "bf16":
            oh_hi = (hi[:, None] == iota[None, :]).astype(jnp.bfloat16)
            oh_lo = (lo[:, None] == iota[None, :]).astype(jnp.bfloat16)
            h = jnp.dot(oh_hi.T, oh_lo, preferred_element_type=jnp.float32)
        elif variant == "i8f32":
            oh_hi = (hi[:, None] == iota[None, :]).astype(jnp.int8)
            oh_lo = (lo[:, None] == iota[None, :]).astype(jnp.int8)
            h = jnp.dot(oh_hi.T, oh_lo, preferred_element_type=jnp.float32)
        elif variant == "i8i32":
            oh_hi = (hi[:, None] == iota[None, :]).astype(jnp.int8)
            oh_lo = (lo[:, None] == iota[None, :]).astype(jnp.int8)
            h = jnp.dot(oh_hi.T, oh_lo, preferred_element_type=jnp.int32)
        return h.reshape(256).astype(jnp.int32)

    def hist(flat):
        n_ = flat.shape[0]
        if n_ <= CHUNK:
            return hist_chunk(flat)
        n_chunks = n_ // CHUNK
        hists = jax.vmap(hist_chunk)(flat[: n_chunks * CHUNK].reshape(
            n_chunks, CHUNK))
        return jnp.sum(hists, axis=0)

    def make(K):
        @jax.jit
        def run(b):
            def body(i, acc):
                return acc + (hist(jnp.roll(b, i))[3] & 0xFFFF)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    per = kslope(make, jdata, f"hist[{n_mb}MiB {variant}]")
    gbps = n / max(per, 1e-9) / 1e9
    log(f"hist {n_mb}MiB {variant}: {per*1e3:.2f} ms -> {gbps:.2f} GB/s")
    return gbps


def main():
    log(f"device: {jax.devices()[0]} ({jax.default_backend()})")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    res = {}
    if which in ("all", "hist"):
        for v in ("bf16", "i8f32", "i8i32"):
            res[f"hist16_{v}"] = bench_hist(16, v)
    if which in ("all", "enc"):
        res["enc16_cell"] = bench_encode(16, True)
        res["enc16_flat"] = bench_encode(16, False)
        res["enc100_cell"] = bench_encode(100, True)
        res["enc100_flat"] = bench_encode(100, False)
    log("\n==== summary ====")
    for k, v in res.items():
        log(f"{k}: {v:.2f} GB/s")


if __name__ == "__main__":
    main()

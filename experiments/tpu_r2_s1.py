# NOTE (r3): the enc3/full3 variants referenced encode_blocks_pallas3, which
# was removed from the package (documented negative result + rotted code).
"""Round-2 session 1: decompose BENCH_r01 (4.81 GB/s, 421 s compile).

Times each stage of the bench's one_iter separately on the real chip with
the K-slope method, and logs per-variant compile time to find the 421 s
culprit.  Run one variant per process:  python tpu_r2_s1.py <variant>

variants: full hist enc kern pack roll xla256 xla512
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
DATA_MB = int(os.environ.get("BENCH_MB", "16"))
BLOCK_LEN = int(os.environ.get("BENCH_BLOCK", "256"))
K1, K2, REPS = 2, 16, 3


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


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


def slope(make, arg, n_bytes):
    times = {}
    for K in (K1, K2):
        f = make(K)
        t0 = time.time()
        int(f(arg))
        log(f"  K={K}: compile+first {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            int(f(arg))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
        log(f"  K={K}: best total {best*1e3:.1f}ms")
    per = (times[K2] - times[K1]) / (K2 - K1)
    log(f"  per-iter {per*1e3:.3f}ms -> {n_bytes/max(per,1e-9)/1e9:.2f} GB/s")
    return per


def main():
    from tpuhuff.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from tpuhuff.core.canonical import canonicalize
    from tpuhuff.core.tree import HuffTree
    from tpuhuff.core.weights import ByteWeights
    from tpuhuff.kernels.encode import (
        encode_blocks, make_canonical_encode_tables, make_encode_tables,
    )
    from tpuhuff.kernels.histogram import histogram

    dev = jax.devices()[0]
    log(f"device: {dev} ({jax.default_backend()}) variant={VARIANT}")

    n = DATA_MB << 20
    data = make_textlike(n)
    B = n // BLOCK_LEN
    blocks_np = data[: B * BLOCK_LEN].reshape(B, BLOCK_LEN)
    tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
    lens_lut, codes_lut = tree.encode_tables()
    dl, da = make_encode_tables(lens_lut, codes_lut)
    canon = make_canonical_encode_tables(tree)
    canon_tabs = canon[:4]
    FULL = bool(canon[5])
    ML = int(lens_lut.max())
    log(f"ML={ML} B={B} N={BLOCK_LEN}")

    t0 = time.time()
    jblocks = jax.device_put(jnp.asarray(blocks_np), dev)
    jblocks.block_until_ready()
    log(f"upload {DATA_MB} MiB: {time.time()-t0:.1f}s")

    if VARIANT == "full":
        def one(b, i):
            r = jnp.roll(b, i, axis=0)
            h = histogram(r)
            w, bits = encode_blocks(r, dl, da, max_code_len=ML,
                                    canon_tables=canon_tabs,
                                    full_alphabet=FULL)
            return (jnp.sum(bits) + h[0]).astype(jnp.int32) & 0xFFFF
    elif VARIANT == "hist":
        def one(b, i):
            r = jnp.roll(b, i, axis=0)
            return histogram(r)[0].astype(jnp.int32) & 0xFFFF
    elif VARIANT == "roll":
        def one(b, i):
            r = jnp.roll(b, i, axis=0)
            return jnp.sum(r.astype(jnp.int32)) & 0xFFFF
    elif VARIANT == "enc":
        def one(b, i):
            r = jnp.roll(b, i, axis=0)
            w, bits = encode_blocks(r, dl, da, max_code_len=ML,
                                    canon_tables=canon_tabs,
                                    full_alphabet=FULL)
            return jnp.sum(bits).astype(jnp.int32) & 0xFFFF
    elif VARIANT in ("xla256", "xla512"):
        if VARIANT == "xla512":
            B2 = n // 512
            jblocks = jax.device_put(
                jnp.asarray(data[: B2 * 512].reshape(B2, 512)), dev)

        def one(b, i):
            r = jnp.roll(b, i, axis=0)
            w, bits = encode_blocks(r, dl, da, max_code_len=ML,
                                    canon_tables=canon_tabs, pallas=False)
            return jnp.sum(bits).astype(jnp.int32) & 0xFFFF
    elif VARIANT == "enc3":
        from tpuhuff.kernels.pallas_encode2 import encode_blocks_pallas3

        def one(b, i):
            r = jnp.roll(b, i, axis=0)
            w, bits = encode_blocks_pallas3(r, canon_tabs, ML)
            return jnp.sum(bits).astype(jnp.int32) & 0xFFFF
    elif VARIANT == "lut3":
        from tpuhuff.kernels.encode import lut_canonical

        def one(b, i):
            r = jnp.roll(b, i, axis=0)
            ln, acode = lut_canonical(r.astype(jnp.int32), *canon_tabs, ML)
            l0, l1 = ln[:, 0::2], ln[:, 1::2]
            x = acode[:, 0::2] | (acode[:, 1::2] >> l0.astype(jnp.uint32))
            xt = x.T
            lt = (l0 + l1).T
            return (jnp.sum(lt) + xt[0, 0].astype(jnp.int32)) & 0xFFFF
    elif VARIANT == "full3":
        from tpuhuff.kernels.pallas_encode2 import encode_blocks_pallas3

        def one(b, i):
            r = jnp.roll(b, i, axis=0)
            h = histogram(r)
            w, bits = encode_blocks_pallas3(r, canon_tabs, ML)
            return (jnp.sum(bits) + h[0]).astype(jnp.int32) & 0xFFFF
    elif VARIANT == "pack":
        from tpuhuff.kernels.pallas_encode2 import pack_pairs

        def one(b, i):
            r = jnp.roll(b, i, axis=0)
            p = pack_pairs(r)
            return jnp.sum(p, dtype=jnp.int32) & 0xFFFF
    elif VARIANT == "kern":
        from tpuhuff.kernels.pallas_encode2 import _encode_call, pack_pairs

        data_t = jax.jit(pack_pairs)(jblocks)
        data_t.block_until_ready()
        valid_t = jnp.full((1, B), BLOCK_LEN, jnp.int32)
        inv4 = jnp.asarray(np.asarray(canon_tabs[0], np.uint32).reshape(1, 64))
        pres = jnp.asarray(np.asarray(canon_tabs[1], np.uint32).reshape(1, 8))
        cumle32 = np.zeros((1, 32), np.int32)
        cumle32[0, : np.asarray(canon_tabs[2]).size] = np.asarray(canon_tabs[2])
        dd32 = np.zeros((1, 32), np.int32)
        dd32[0, : np.asarray(canon_tabs[3]).size] = np.asarray(canon_tabs[3])
        jc, jd = jnp.asarray(cumle32), jnp.asarray(dd32)

        def one(b, i):
            r = jnp.roll(b, i, axis=1)
            w, bits = _encode_call(r, valid_t, inv4, pres, jc, jd,
                                   BLOCK_LEN, ML, True, False, FULL)
            return (jnp.sum(bits) + w[0, 0]).astype(jnp.int32) & 0xFFFF

        jblocks = data_t
    else:
        raise SystemExit(f"unknown variant {VARIANT}")

    def make(K):
        @jax.jit
        def run(b):
            return jax.lax.fori_loop(
                0, K, lambda i, acc: acc + one(b, i), jnp.int32(0))
        return run

    slope(make, jblocks, n)


if __name__ == "__main__":
    main()

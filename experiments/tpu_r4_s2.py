"""r4 session 2 — encode G sweep, u8-compare hist, N=1024 cap validation,
honest decode (bitcast-consume), final two-pass candidate.

Follow-up to r4 s1: fused hist+encode showed NO MXU/VPU overlap (13.24 vs
13.08 separate), hist is compare-bound, G=4 encode honest 11.75 GB/s.
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
from tpuhuff.kernels.pallas_histogram import histogram_pallas

MB = int(os.environ.get("S2_MB", "100"))
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
    return (times[K2] - times[K1]) / (K2 - K1)


def consume_words(words):
    b = jax.lax.bitcast_convert_type(words[..., None], jnp.uint8)
    return jnp.sum(b.astype(jnp.int32)) & 0xFFFF


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} ({jax.default_backend()})")
    n = MB << 20
    data = make_textlike(n)
    B = n // N
    lanes = data.reshape(B, N)
    tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
    lens_lut, codes_lut = tree.encode_tables()
    tabs = kenc.make_canonical_encode_tables(tree)
    canon = tabs[:4]
    full = bool(tabs[5])
    ML = int(np.asarray(lens_lut).max())
    jl = jax.device_put(jnp.asarray(lanes), dev)
    jl.block_until_ready()
    log(f"n={MB}MiB B={B} N={N} ML={ML}")

    # ---- hist u8 vs i32 compares at G=8 ----
    href = np.bincount(data, minlength=256)

    def hist_make(G, u8):
        def make(K):
            @jax.jit
            def run(b):
                def body(i, acc):
                    h = histogram_pallas(b ^ (i & 255).astype(jnp.uint8),
                                         G=G, u8=u8)
                    return (acc + h[0]).astype(jnp.int32) & 0xFFFF
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        return make

    for G, u8 in ((8, True), (8, False), (16, True)):
        try:
            hg = np.asarray(histogram_pallas(jl, G=G, u8=u8))
            assert np.array_equal(hg, href), f"hist G={G} u8={u8} mismatch"
            per = kslope(hist_make(G, u8), jl, f"hist G={G} u8={u8}")
            log(f"hist G={G} u8={u8}: exact, {per*1e3:.2f} ms -> "
                f"{n/per/1e9:.2f} GB/s")
        except Exception as e:
            log(f"hist G={G} u8={u8}: FAILED {type(e).__name__}: {e}")

    # ---- encode G sweep (honest, TOUT=1) ----
    def enc_make(groups):
        pe2.ENC_TOUT = True
        pe2.ENC_GROUPS = groups

        def make(K):
            @jax.jit
            def run(b):
                def body(i, acc):
                    valid = jnp.full(B, N, jnp.int32).at[B - 1].set(
                        N - (i & 1))
                    w, bl = pe2.encode_blocks_pallas2(
                        b, canon, ML, valid_lens=valid, full_alphabet=full)
                    return (acc + consume_words(w) + jnp.sum(bl)
                            ).astype(jnp.int32) & 0xFFFF
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        return make

    best_g, best_per = 1, float("inf")
    for g in (2, 4, 8):
        try:
            per = kslope(enc_make(g), jl, f"enc G={g}")
            log(f"enc G={g}: {per*1e3:.2f} ms -> {n/per/1e9:.2f} GB/s")
            if per < best_per:
                best_g, best_per = g, per
        except Exception as e:
            log(f"enc G={g}: FAILED {type(e).__name__}: {e}")

    # ---- final two-pass candidate: encode G=best + hist u8 G=8 ----
    def twopass_make(K):
        pe2.ENC_TOUT = True
        pe2.ENC_GROUPS = best_g

        @jax.jit
        def run(b):
            def body(i, acc):
                valid = jnp.full(B, N, jnp.int32).at[B - 1].set(N - (i & 1))
                w, bl = pe2.encode_blocks_pallas2(
                    b, canon, ML, valid_lens=valid, full_alphabet=full)
                h = histogram_pallas(b ^ (i & 255).astype(jnp.uint8),
                                     G=8, u8=True)
                return (acc + consume_words(w) + jnp.sum(bl) + h[0]
                        ).astype(jnp.int32) & 0xFFFF
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    try:
        per = kslope(twopass_make, jl, f"two-pass G={best_g}+histu8")
        log(f"two-pass G={best_g}+histu8: {per*1e3:.2f} ms -> "
            f"{n/per/1e9:.2f} GB/s")
    except Exception as e:
        log(f"two-pass: FAILED {type(e).__name__}: {e}")

    # ---- fused enc+hist with u8 compares (overlap re-check) ----
    def fused_make(groups):
        pe2.ENC_TOUT = True
        pe2.ENC_GROUPS = groups

        def make(K):
            @jax.jit
            def run(b):
                def body(i, acc):
                    valid = jnp.full(B, N, jnp.int32).at[B - 1].set(
                        N - (i & 1))
                    w, bl, h = pe2.encode_blocks_pallas2(
                        b, canon, ML, valid_lens=valid, full_alphabet=full,
                        hist_data=b.reshape(-1))
                    return (acc + consume_words(w) + jnp.sum(bl) + h[0]
                            ).astype(jnp.int32) & 0xFFFF
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        return make

    try:
        per = kslope(fused_make(best_g), jl, f"enc+hist-in-kernel G={best_g}")
        log(f"enc+hist-in-kernel G={best_g}: {per*1e3:.2f} ms -> "
            f"{n/per/1e9:.2f} GB/s")
    except Exception as e:
        log(f"enc+hist-in-kernel: FAILED {type(e).__name__}: {e}")

    # ---- N=1024 TOUT parity (PALLAS_MAX_BLOCK cap validation) ----
    try:
        from tpuhuff import native
        from tpuhuff.dist import stitch_words
        n2 = 16 << 20
        B2 = n2 // 1024
        jl2 = jnp.asarray(data[:n2].reshape(B2, 1024))
        pe2.ENC_TOUT = True
        pe2.ENC_GROUPS = 1
        t0 = time.time()
        w2, b2 = pe2.encode_blocks_pallas2(jl2, canon, ML,
                                           full_alphabet=full)
        w2.block_until_ready()
        log(f"N=1024 compile+run {time.time()-t0:.1f}s")
        pay2, _ = stitch_words(np.asarray(w2),
                               np.asarray(b2).astype(np.uint64))
        hp2, _ = native.encode(data[:n2], lens_lut, codes_lut)
        assert pay2 == hp2, "N=1024 full payload mismatch"
        log("N=1024 TOUT full-payload parity: OK")
    except Exception as e:
        log(f"N=1024: FAILED {type(e).__name__}: {e}")

    # ---- honest decode: bitcast-consume the full (B, 256) output ----
    try:
        from tpuhuff.dist import stitch_words
        from tpuhuff.kernels.decode import (
            make_canonical_decode_tables, payload_to_lane_words,
        )
        from tpuhuff.kernels.pallas_decode import (
            LANES, SUB, decode_rows_fused, make_fused_tables,
        )

        DEC_BLOCK = 256
        pe2.ENC_GROUPS = 4
        wd, bd = pe2.encode_blocks_pallas2(jl, canon, ML,
                                           full_alphabet=full)
        bd_np = np.asarray(bd).astype(np.int64)
        payload, _ = stitch_words(np.asarray(wd), bd_np.astype(np.uint64))
        ends = np.cumsum(bd_np)
        starts = np.concatenate([[0], ends[:-1]])
        rows, bit0 = payload_to_lane_words(payload, starts, ends, DEC_BLOCK)
        nbits = (ends - starts).astype(np.int32)
        unroll = 16
        group = SUB * LANES
        Bp = -(-B // group) * group
        wpad = max(rows.shape[1], unroll + 1)
        rows_p = np.zeros((Bp, wpad), np.uint32)
        rows_p[:B, : rows.shape[1]] = rows
        bit0_p = np.zeros(Bp, np.int32); bit0_p[:B] = bit0
        nbits_p = np.zeros(Bp, np.int32); nbits_p[:B] = nbits
        ub, dd, perm4, ml = make_canonical_decode_tables(tree)
        jub, jdd, jperm = make_fused_tables(ub, dd, perm4)
        jrows = jax.device_put(jnp.asarray(rows_p), dev)
        jbit0 = jax.device_put(jnp.asarray(bit0_p), dev)
        jnbits = jax.device_put(jnp.asarray(nbits_p), dev)
        out = np.asarray(decode_rows_fused(
            jrows, jbit0, jnbits, jub, jdd, jperm, ml, DEC_BLOCK, unroll))
        assert np.array_equal(out[:B].reshape(-1), data), "decode mismatch"
        log("decode bit-exact: OK")

        def dec_make(K):
            @jax.jit
            def run(args):
                r, b0, nb = args

                def body(i, acc):
                    nb2 = nb.at[-1].add(-(i & 1))
                    o = decode_rows_fused(r, b0, nb2, jub, jdd, jperm,
                                          ml, DEC_BLOCK, unroll)
                    w32 = jax.lax.bitcast_convert_type(
                        o.reshape(o.shape[0], o.shape[1] // 4, 4),
                        jnp.uint32)
                    return (acc + jnp.sum(w32.astype(jnp.int32))
                            ).astype(jnp.int32) & 0xFFFF
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run

        per = kslope(dec_make, (jrows, jbit0, jnbits), "decode honest")
        log(f"decode honest: {per*1e3:.2f} ms -> {n/per/1e9:.2f} GB/s")

        # old-style (r3, DCE-prone) consumption for the delta record
        def dec_make_old(K):
            @jax.jit
            def run(args):
                r, b0, nb = args

                def body(i, acc):
                    nb2 = nb.at[-1].add(-(i & 1))
                    o = decode_rows_fused(r, b0, nb2, jub, jdd, jperm,
                                          ml, DEC_BLOCK, unroll)
                    return acc + o[0, 0].astype(jnp.int32) + o[-1, -1]
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run

        per = kslope(dec_make_old, (jrows, jbit0, jnbits), "decode r3-style")
        log(f"decode r3-style (corner-consume): {per*1e3:.2f} ms -> "
            f"{n/per/1e9:.2f} GB/s")
    except Exception as e:
        log(f"decode section FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

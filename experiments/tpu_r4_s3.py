"""r4 session 3 — shift-free u8 hist, enc G=16, decode transposed-out
honest rates, final two-pass number.

Follow-up to r4 s2: u8 hist failed on i8-vector shrui (now AND-based);
enc G monotone up to 12.10 at G=8; honest decode 10.18 (XLA inverse
layout real cost) — now emitted transposed from the kernel.
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
from tpuhuff.kernels import pallas_decode as pdec
from tpuhuff.kernels.pallas_histogram import histogram_pallas

MB = int(os.environ.get("S3_MB", "100"))
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

    # ---- 1. hist u8-AND ----
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

    hist_u8_ok = False
    try:
        hg = np.asarray(histogram_pallas(jl, G=8, u8=True))
        assert np.array_equal(hg, href), "hist u8 mismatch"
        per = kslope(hist_make(8, True), jl, "hist G=8 u8-AND")
        log(f"hist G=8 u8-AND: exact, {per*1e3:.2f} ms -> {n/per/1e9:.2f} GB/s")
        hist_u8_ok = True
    except Exception as e:
        log(f"hist G=8 u8-AND: FAILED {type(e).__name__}: {e}")

    # ---- 2. enc G=16 ----
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

    for g in (16,):
        try:
            per = kslope(enc_make(g), jl, f"enc G={g}")
            log(f"enc G={g}: {per*1e3:.2f} ms -> {n/per/1e9:.2f} GB/s")
        except Exception as e:
            log(f"enc G={g}: FAILED {type(e).__name__}: {e}")

    # ---- 3. decode tout honest ----
    try:
        from tpuhuff.dist import stitch_words
        from tpuhuff.kernels.decode import (
            make_canonical_decode_tables, payload_to_lane_words,
        )

        DEC_BLOCK = 256
        pe2.ENC_GROUPS = 8
        wd, bd = pe2.encode_blocks_pallas2(jl, canon, ML, full_alphabet=full)
        bd_np = np.asarray(bd).astype(np.int64)
        payload, _ = stitch_words(np.asarray(wd), bd_np.astype(np.uint64))
        ends = np.cumsum(bd_np)
        starts = np.concatenate([[0], ends[:-1]])
        rows, bit0 = payload_to_lane_words(payload, starts, ends, DEC_BLOCK)
        nbits = (ends - starts).astype(np.int32)
        unroll = 16
        group = pdec.SUB * pdec.LANES
        Bp = -(-B // group) * group
        wpad = max(rows.shape[1], unroll + 1)
        rows_p = np.zeros((Bp, wpad), np.uint32)
        rows_p[:B, : rows.shape[1]] = rows
        bit0_p = np.zeros(Bp, np.int32); bit0_p[:B] = bit0
        nbits_p = np.zeros(Bp, np.int32); nbits_p[:B] = nbits
        ub, dd, perm4, ml = make_canonical_decode_tables(tree)
        jub, jdd, jperm = pdec.make_fused_tables(ub, dd, perm4)
        jrows = jax.device_put(jnp.asarray(rows_p), dev)
        jbit0 = jax.device_put(jnp.asarray(bit0_p), dev)
        jnbits = jax.device_put(jnp.asarray(nbits_p), dev)
        assert pdec._dec_tout_ok(unroll, DEC_BLOCK)
        out = np.asarray(pdec.decode_rows_fused(
            jrows, jbit0, jnbits, jub, jdd, jperm, ml, DEC_BLOCK, unroll))
        assert np.array_equal(out[:B].reshape(-1), data), "decode mismatch"
        log("decode tout bit-exact: OK")

        def dec_make(K):
            @jax.jit
            def run(args):
                r, b0, nb = args

                def body(i, acc):
                    nb2 = nb.at[-1].add(-(i & 1))
                    o = pdec.decode_rows_fused(r, b0, nb2, jub, jdd, jperm,
                                               ml, DEC_BLOCK, unroll)
                    w32 = jax.lax.bitcast_convert_type(
                        o.reshape(o.shape[0], o.shape[1] // 4, 4),
                        jnp.uint32)
                    return (acc + jnp.sum(w32.astype(jnp.int32))
                            ).astype(jnp.int32) & 0xFFFF
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run

        per = kslope(dec_make, (jrows, jbit0, jnbits), "decode tout honest")
        log(f"decode tout honest: {per*1e3:.2f} ms -> {n/per/1e9:.2f} GB/s")
    except Exception as e:
        log(f"decode tout: FAILED {type(e).__name__}: {e}")

    # ---- 3b. general decode tout honest (16 MiB) ----
    try:
        from tpuhuff.dist import stitch_words
        from tpuhuff.kernels.decode import (
            make_decode_tables, payload_to_lane_words,
        )
        from tpuhuff.kernels.encode import make_encode_tables

        DEC_BLOCK = 256
        gtree = HuffTree.from_weights(ByteWeights.from_bytes(data))
        glens, gcodes = gtree.encode_tables()
        gdl, gda = make_encode_tables(glens, gcodes)
        gml = int(np.asarray(glens).max())
        gn = 16 << 20
        gB = gn // DEC_BLOCK
        gw, gb = kenc.encode_blocks(
            jnp.asarray(data[:gn].reshape(gB, DEC_BLOCK)), gdl, gda,
            max_code_len=gml)
        gb_np = np.asarray(gb).astype(np.int64)
        gpayload, _ = stitch_words(np.asarray(gw), gb_np.astype(np.uint64))
        gends = np.cumsum(gb_np)
        gstarts = np.concatenate([[0], gends[:-1]])
        grows, gbit0 = payload_to_lane_words(gpayload, gstarts, gends,
                                             DEC_BLOCK)
        gnbits = (gends - gstarts).astype(np.int32)
        unroll = 16
        group = pdec.SUB * pdec.LANES
        gBp = -(-gB // group) * group
        gwpad = max(grows.shape[1], unroll + 1)
        grp = np.zeros((gBp, gwpad), np.uint32)
        grp[:gB, : grows.shape[1]] = grows
        gb0 = np.zeros(gBp, np.int32); gb0[:gB] = gbit0
        gnb = np.zeros(gBp, np.int32); gnb[:gB] = gnbits
        thr, sym4, len4 = make_decode_tables(gtree)
        K_leaves = int((np.asarray(glens) > 0).sum())
        levels = max(1, (K_leaves - 1).bit_length())
        jeytz, jsym, jlen = pdec.make_general_fused_tables(thr, sym4, len4)
        gjr = jax.device_put(jnp.asarray(grp), dev)
        gjb = jax.device_put(jnp.asarray(gb0), dev)
        gjn = jax.device_put(jnp.asarray(gnb), dev)
        gout = np.asarray(pdec.decode_rows_fused_general(
            gjr, gjb, gjn, jeytz, jsym, jlen, DEC_BLOCK, unroll,
            levels=levels))
        assert np.array_equal(gout[:gB].reshape(-1), data[:gn])
        log("general decode tout bit-exact: OK")

        def gdec_make(K):
            @jax.jit
            def run(args):
                r, b0, nb = args

                def body(i, acc):
                    nb2 = nb.at[-1].add(-(i & 1))
                    o = pdec.decode_rows_fused_general(
                        r, b0, nb2, jeytz, jsym, jlen, DEC_BLOCK, unroll,
                        levels=levels)
                    w32 = jax.lax.bitcast_convert_type(
                        o.reshape(o.shape[0], o.shape[1] // 4, 4),
                        jnp.uint32)
                    return (acc + jnp.sum(w32.astype(jnp.int32))
                            ).astype(jnp.int32) & 0xFFFF
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run

        per = kslope(gdec_make, (gjr, gjb, gjn), "gen decode tout honest")
        log(f"general decode tout honest: {per*1e3:.2f} ms -> "
            f"{gn/per/1e9:.2f} GB/s (levels={levels})")
    except Exception as e:
        log(f"general decode tout: FAILED {type(e).__name__}: {e}")

    # ---- 4. final two-pass: enc G=8 + hist (u8 if ok) ----
    def twopass_make(K):
        pe2.ENC_TOUT = True
        pe2.ENC_GROUPS = 8

        @jax.jit
        def run(b):
            def body(i, acc):
                valid = jnp.full(B, N, jnp.int32).at[B - 1].set(N - (i & 1))
                w, bl = pe2.encode_blocks_pallas2(
                    b, canon, ML, valid_lens=valid, full_alphabet=full)
                h = histogram_pallas(b ^ (i & 255).astype(jnp.uint8),
                                     G=8, u8=hist_u8_ok)
                return (acc + consume_words(w) + jnp.sum(bl) + h[0]
                        ).astype(jnp.int32) & 0xFFFF
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    try:
        per = kslope(twopass_make, jl, "two-pass G8+hist")
        log(f"two-pass G8+hist(u8={hist_u8_ok}): {per*1e3:.2f} ms -> "
            f"{n/per/1e9:.2f} GB/s")
    except Exception as e:
        log(f"two-pass: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

"""r4 session 7 — decode BL sweep (128/256/512) + encode lane sweep
(128/256/512) under honest consumption.  Both could move product
defaults (DEVICE_HF2_BLOCK, the writers' lane choice)."""

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

MB = 100
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
    tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
    lens_lut, codes_lut = tree.encode_tables()
    tabs = kenc.make_canonical_encode_tables(tree)
    canon, full, ML = tabs[:4], bool(tabs[5]), tabs[4]

    # ---- encode lane sweep ----
    pe2.ENC_TOUT = True
    pe2.ENC_GROUPS = 4
    for N in (128, 256, 512):
        try:
            B = n // N
            jl = jax.device_put(jnp.asarray(data.reshape(B, N)), dev)
            jl.block_until_ready()

            @jax.jit
            def run(b, K, _B=B, _N=N):
                def body(i, acc):
                    valid = jnp.full(_B, _N, jnp.int32).at[_B - 1].set(
                        _N - (i & 1))
                    w, bl = pe2.encode_blocks_pallas2(
                        b, canon, ML, valid_lens=valid, full_alphabet=full)
                    return (acc + consume_words(w) + jnp.sum(bl)
                            ).astype(jnp.int32) & 0xFFFF
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))

            per = kslope(run, jl, f"enc N={N}")
            log(f"enc N={N} (G=4): {per*1e3:.2f} ms -> {n/per/1e9:.2f} GB/s")
            del jl
        except Exception as e:
            log(f"enc N={N}: FAILED {type(e).__name__}: {e}")

    # ---- decode BL sweep ----
    from tpuhuff.dist import stitch_words
    from tpuhuff.kernels.decode import (
        make_canonical_decode_tables, payload_to_lane_words,
    )

    ub, dd_, perm4, ml = make_canonical_decode_tables(tree)
    jub, jdd, jperm = pdec.make_fused_tables(ub, dd_, perm4)
    group = pdec.SUB * pdec.LANES
    dl, da = kenc.make_encode_tables(lens_lut, codes_lut)
    for BL in (128, 256, 512):
        try:
            B = n // BL
            wd, bd = kenc.encode_blocks(
                jnp.asarray(data.reshape(B, BL)), dl, da, max_code_len=ML,
                canon_tables=canon, full_alphabet=full)
            bd_np = np.asarray(bd).astype(np.int64)
            payload, _ = stitch_words(np.asarray(wd),
                                      bd_np.astype(np.uint64))
            ends = np.cumsum(bd_np)
            starts = np.concatenate([[0], ends[:-1]])
            rows, bit0 = payload_to_lane_words(payload, starts, ends, BL)
            nbits = (ends - starts).astype(np.int32)
            unroll = 16
            Bp = -(-B // group) * group
            wpad = max(rows.shape[1], unroll + 1)
            rows_p = np.zeros((Bp, wpad), np.uint32)
            rows_p[:B, : rows.shape[1]] = rows
            bit0_p = np.zeros(Bp, np.int32); bit0_p[:B] = bit0
            nbits_p = np.zeros(Bp, np.int32); nbits_p[:B] = nbits
            jrows = jax.device_put(jnp.asarray(rows_p), dev)
            jbit0 = jax.device_put(jnp.asarray(bit0_p), dev)
            jnbits = jax.device_put(jnp.asarray(nbits_p), dev)
            out = np.asarray(pdec.decode_rows_fused(
                jrows, jbit0, jnbits, jub, jdd, jperm, ml, BL, unroll))
            assert np.array_equal(out[:B].reshape(-1), data), BL

            @jax.jit
            def dec_run(args, K, _r=jrows, _b=jbit0, _n=jnbits, _BL=BL):
                def body(i, acc):
                    nb2 = _n.at[-1].add(-(i & 1))
                    o = pdec.decode_rows_fused(_r, _b, nb2, jub, jdd,
                                               jperm, ml, _BL, 16)
                    w32 = jax.lax.bitcast_convert_type(
                        o.reshape(o.shape[0], o.shape[1] // 4, 4),
                        jnp.uint32)
                    return (acc + jnp.sum(w32.astype(jnp.int32))
                            ).astype(jnp.int32) & 0xFFFF
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))

            per = kslope(dec_run, 0, f"dec BL={BL}")
            tout = pdec._dec_tout_ok(16, BL)
            log(f"dec BL={BL} (tout={tout}): {per*1e3:.2f} ms -> "
                f"{n/per/1e9:.2f} GB/s")
            del jrows, jbit0, jnbits
        except Exception as e:
            log(f"dec BL={BL}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

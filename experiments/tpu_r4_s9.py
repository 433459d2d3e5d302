"""r4 s9 — decode cell-grouping sweep (the encode-G analogue)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuhuff.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from tpuhuff.core.canonical import canonicalize
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels import encode as kenc
from tpuhuff.kernels import pallas_encode2 as pe2
from tpuhuff.kernels import pallas_decode as pdec

def log(*a): print(*a, flush=True)

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

def main():
    dev = jax.devices()[0]; log(f"device: {dev}")
    n = 100 << 20
    data = make_textlike(n)
    tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
    tabs = kenc.make_canonical_encode_tables(tree)
    canon, full, ML = tabs[:4], bool(tabs[5]), tabs[4]
    BL = 256; B = n // BL
    jl = jnp.asarray(data.reshape(B, BL))
    from tpuhuff.dist import stitch_words
    from tpuhuff.kernels.decode import make_canonical_decode_tables, payload_to_lane_words
    wd, bd = pe2.encode_blocks_pallas2(jl, canon, ML, full_alphabet=full)
    bd_np = np.asarray(bd).astype(np.int64)
    payload, _ = stitch_words(np.asarray(wd), bd_np.astype(np.uint64))
    ends = np.cumsum(bd_np); starts = np.concatenate([[0], ends[:-1]])
    rows, bit0 = payload_to_lane_words(payload, starts, ends, BL)
    nbits = (ends - starts).astype(np.int32)
    unroll = 16
    group = pdec.SUB * pdec.LANES
    Bp = -(-B // group) * group
    wpad = max(rows.shape[1], unroll + 1)
    rows_p = np.zeros((Bp, wpad), np.uint32); rows_p[:B, :rows.shape[1]] = rows
    bit0_p = np.zeros(Bp, np.int32); bit0_p[:B] = bit0
    nbits_p = np.zeros(Bp, np.int32); nbits_p[:B] = nbits
    ub, dd_, perm4, ml = make_canonical_decode_tables(tree)
    jub, jdd, jperm = pdec.make_fused_tables(ub, dd_, perm4)
    jrows = jax.device_put(jnp.asarray(rows_p), dev)
    jbit0 = jax.device_put(jnp.asarray(bit0_p), dev)
    jnbits = jax.device_put(jnp.asarray(nbits_p), dev)
    for G in (1, 2, 4, 8):
        try:
            out = np.asarray(pdec.decode_rows_fused(
                jrows, jbit0, jnbits, jub, jdd, jperm, ml, BL, unroll,
                groups=G))
            assert np.array_equal(out[:B].reshape(-1), data), G
            @jax.jit
            def dec_run(args, K, _G=G):
                r, b0, nb = args
                def body(i, acc):
                    nb2 = nb.at[-1].add(-(i & 1))
                    o = pdec.decode_rows_fused(r, b0, nb2, jub, jdd, jperm,
                                               ml, BL, unroll, groups=_G)
                    w32 = jax.lax.bitcast_convert_type(
                        o.reshape(o.shape[0], o.shape[1] // 4, 4), jnp.uint32)
                    return (acc + jnp.sum(w32.astype(jnp.int32))
                            ).astype(jnp.int32) & 0xFFFF
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            times = {}
            for K in (2, 16):
                t0 = time.time(); int(dec_run((jrows, jbit0, jnbits), K))
                log(f"  G={G} K={K} compile+first {time.time()-t0:.1f}s")
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter(); int(dec_run((jrows, jbit0, jnbits), K))
                    best = min(best, time.perf_counter() - t0)
                times[K] = best
            per = (times[16] - times[2]) / 14
            log(f"decode G={G}: bit-exact, {per*1e3:.2f} ms -> {n/per/1e9:.2f} GB/s")
        except Exception as e:
            log(f"decode G={G}: FAILED {type(e).__name__}: {e}")

if __name__ == "__main__":
    main()

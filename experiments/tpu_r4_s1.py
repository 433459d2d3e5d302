"""r4 session 1 — hardware validation + honest-measurement A/Bs.

VERDICT r3 #1/#2/#3/#7:
  1. Does Mosaic accept the TN identity-dot transpose (transpose_out)?
  2. HONEST encode throughput: consume EVERY output element via a
     bitcast-reduction (sum alone commutes through transposes — XLA folds
     reduce(transpose(x)) into a permuted reduce, eliding the layout pass
     the product pays; a u32<->u8 bitcast is adjacency-in-final-layout and
     cannot be commuted).  A/B: TOUT=1/0, G=1/4.
  3. Fused hist+encode (hist_data operand) vs encode + separate hist —
     the two-pass serial-composition breaker.
  4. Standalone Pallas histogram G=8 vs G=16.
  5. N=2048 fused-encode parity on hardware (cap check).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuhuff.cache import enable_compile_cache
enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from tpuhuff.core.canonical import canonicalize
from tpuhuff.core.codec import pack_codes_u8
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels import encode as kenc
from tpuhuff.kernels import pallas_encode2 as pe2
from tpuhuff.kernels.pallas_histogram import histogram_pallas

MB = int(os.environ.get("S1_MB", "100"))
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
    """Layout-forcing full reduction: u32 words -> u8 bitcast -> i32 sum."""
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
    log(f"n={MB}MiB B={B} N={N} ML={ML} full_alpha={full}")
    jl = jax.device_put(jnp.asarray(lanes), dev)
    jl.block_until_ready()

    # ---- 1. correctness of transpose_out on hardware ----
    pe2.ENC_TOUT = True
    pe2.ENC_GROUPS = 1
    t0 = time.time()
    words, bits = pe2.encode_blocks_pallas2(jl, canon, ML, full_alphabet=full)
    words.block_until_ready()
    log(f"TOUT compile+run: {time.time()-t0:.1f}s words{words.shape}")
    wnp, bnp = np.asarray(words), np.asarray(bits)
    for b in (0, 1, B // 2, B - 1):
        ref, _ = pack_codes_u8(lanes[b], lens_lut, codes_lut)
        got = kenc.words_to_payload(wnp[b], int(bnp[b]))
        assert got == ref, f"lane {b} mismatch"
    log("TOUT bit-exact on 4 lanes: OK")
    # full-payload check vs host C++ (VERDICT #8)
    import hashlib
    from tpuhuff import native
    from tpuhuff.dist import stitch_words
    payload, _ = stitch_words(wnp, bnp.astype(np.uint64))
    hpay, _ = native.encode(data, *tree.encode_tables())
    assert hashlib.sha256(payload).hexdigest() == hashlib.sha256(hpay).hexdigest()
    log("TOUT full-payload SHA vs host C++: OK")

    # ---- 2. honest encode A/B ----
    def enc_make(tout, groups, with_hist):
        pe2.ENC_TOUT = tout
        pe2.ENC_GROUPS = groups

        def make(K):
            @jax.jit
            def run(b):
                def body(i, acc):
                    valid = jnp.full(B, N, jnp.int32).at[B - 1].set(
                        N - (i & 1))
                    if with_hist:
                        w, bl, h = pe2.encode_blocks_pallas2(
                            b, canon, ML, valid_lens=valid,
                            full_alphabet=full, hist_data=b.reshape(-1))
                        extra = jnp.sum(h) & 0xFFFF
                    else:
                        w, bl = pe2.encode_blocks_pallas2(
                            b, canon, ML, valid_lens=valid,
                            full_alphabet=full)
                        extra = 0
                    return (acc + consume_words(w) + jnp.sum(bl) + extra
                            ).astype(jnp.int32) & 0xFFFF
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        return make

    for label, tout, g, wh in (
        ("enc TOUT=1 G=1", True, 1, False),
        ("enc TOUT=0 G=1", False, 1, False),
        ("enc TOUT=1 G=4", True, 4, False),
        ("enc+hist fused TOUT=1 G=1", True, 1, True),
    ):
        try:
            per = kslope(enc_make(tout, g, wh), jl, label)
            log(f"{label}: {per*1e3:.2f} ms -> {n/per/1e9:.2f} GB/s")
        except Exception as e:
            log(f"{label}: FAILED {type(e).__name__}: {e}")

    # ---- two-pass comparison: encode + SEPARATE hist program ----
    def sep_make(K):
        pe2.ENC_TOUT = True
        pe2.ENC_GROUPS = 1

        @jax.jit
        def run(b):
            def body(i, acc):
                valid = jnp.full(B, N, jnp.int32).at[B - 1].set(N - (i & 1))
                w, bl = pe2.encode_blocks_pallas2(
                    b, canon, ML, valid_lens=valid, full_alphabet=full)
                h = histogram_pallas(b ^ (i & 255).astype(jnp.uint8))
                return (acc + consume_words(w) + jnp.sum(bl) + h[0]
                        ).astype(jnp.int32) & 0xFFFF
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    try:
        per = kslope(sep_make, jl, "enc + separate hist (r3 two-pass)")
        log(f"enc + separate hist: {per*1e3:.2f} ms -> {n/per/1e9:.2f} GB/s")
    except Exception as e:
        log(f"separate two-pass FAILED: {type(e).__name__}: {e}")

    # ---- 4. standalone hist G A/B ----
    def hist_make(G):
        def make(K):
            @jax.jit
            def run(b):
                def body(i, acc):
                    h = histogram_pallas(b ^ (i & 255).astype(jnp.uint8),
                                         G=G)
                    return (acc + h[0]).astype(jnp.int32) & 0xFFFF
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        return make

    href = np.bincount(data, minlength=256)
    for G in (8, 16):
        try:
            hg = np.asarray(histogram_pallas(jl, G=G))
            assert np.array_equal(hg, href), f"hist G={G} mismatch"
            per = kslope(hist_make(G), jl, f"hist G={G}")
            log(f"hist G={G}: exact, {per*1e3:.2f} ms -> {n/per/1e9:.2f} GB/s")
        except Exception as e:
            log(f"hist G={G}: FAILED {type(e).__name__}: {e}")

    # ---- 5. N=2048 parity (VERDICT #7) ----
    try:
        n2 = 16 << 20
        B2 = n2 // 2048
        jl2 = jnp.asarray(data[:n2].reshape(B2, 2048))
        pe2.ENC_TOUT = True
        pe2.ENC_GROUPS = 1
        t0 = time.time()
        w2, b2 = pe2.encode_blocks_pallas2(jl2, canon, ML,
                                           full_alphabet=full)
        w2.block_until_ready()
        log(f"N=2048 compile+run {time.time()-t0:.1f}s")
        w2n, b2n = np.asarray(w2), np.asarray(b2)
        from tpuhuff.dist import stitch_words as sw
        pay2, _ = sw(w2n, b2n.astype(np.uint64))
        hp2, _ = native.encode(data[:n2], *tree.encode_tables())
        assert pay2 == hp2, "N=2048 full payload mismatch"
        log("N=2048 TOUT full-payload parity: OK")
    except Exception as e:
        log(f"N=2048: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

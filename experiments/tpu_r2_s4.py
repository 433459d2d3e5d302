"""Round-2 session 4: decode kernels on HW — canonical ladder vs the
general interval-search kernel (foreign/reference-shaped trees).

Usage: python tpu_r2_s4.py {ladder|general} [BLOCK]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "ladder"
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 256
DATA_MB = int(os.environ.get("BENCH_MB", "16"))
K1, K2, REPS = 2, 16, 3


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    from tpuhuff.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from tpuhuff.core.canonical import canonicalize
    from tpuhuff.core.tree import HuffTree
    from tpuhuff.core.weights import ByteWeights
    from tpuhuff.dist import stitch_words
    from tpuhuff.kernels.encode import (
        encode_blocks, make_canonical_encode_tables, make_encode_tables,
    )
    from tpuhuff.kernels.decode import (
        make_canonical_decode_tables, make_decode_tables,
        payload_to_lane_words,
    )
    from tpuhuff.kernels.pallas_decode import (
        LANES, SUB, decode_rows_fused, decode_rows_fused_general,
        make_fused_tables, make_general_fused_tables,
    )

    dev = jax.devices()[0]
    log(f"device: {dev} variant={VARIANT} BL={BLOCK}")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tpu_r2_s1 import make_textlike

    n = DATA_MB << 20
    data = make_textlike(n)
    tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
    if VARIANT == "ladder":
        tree = canonicalize(tree)
    lens_lut, codes_lut = tree.encode_tables()
    ML = int(lens_lut.max())
    dl, da = make_encode_tables(lens_lut, codes_lut)
    tabs = make_canonical_encode_tables(tree)
    ct = tabs[:4] if tabs is not None else None
    B = n // BLOCK
    w, b = encode_blocks(jnp.asarray(data.reshape(B, BLOCK)), dl, da,
                         max_code_len=ML, canon_tables=ct)
    bnp = np.asarray(b).astype(np.int64)
    payload, _ = stitch_words(np.asarray(w), bnp.astype(np.uint64))
    ends = np.cumsum(bnp)
    starts = np.concatenate([[0], ends[:-1]])
    rows, bit0 = payload_to_lane_words(payload, starts, ends, BLOCK)
    nbits = (ends - starts).astype(np.int32)
    unroll = int(os.environ.get("DEC_UNROLL", "8"))
    group = SUB * LANES
    Bp = -(-B // group) * group
    wpad = max(rows.shape[1], unroll + 1)
    rows_p = np.zeros((Bp, wpad), np.uint32)
    rows_p[:B, : rows.shape[1]] = rows
    bit0_p = np.zeros(Bp, np.int32)
    bit0_p[:B] = bit0
    nbits_p = np.zeros(Bp, np.int32)
    nbits_p[:B] = nbits
    jrows = jax.device_put(jnp.asarray(rows_p), dev)
    jbit0 = jax.device_put(jnp.asarray(bit0_p), dev)
    jnbits = jax.device_put(jnp.asarray(nbits_p), dev)

    if VARIANT == "ladder":
        ub, dd, perm4, ml = make_canonical_decode_tables(tree)
        t1, t2, t3 = make_fused_tables(ub, dd, perm4)

        def dec(r, b0, nb):
            return decode_rows_fused(r, b0, nb, t1, t2, t3, ml, BLOCK, unroll)
    else:
        thr, sym4, len4 = make_decode_tables(tree)
        t1, t2, t3 = make_general_fused_tables(thr, sym4, len4)

        def dec(r, b0, nb):
            return decode_rows_fused_general(r, b0, nb, t1, t2, t3, BLOCK,
                                             unroll)

    out = np.asarray(dec(jrows, jbit0, jnbits))
    assert np.array_equal(out[:B].reshape(-1), data), "decode mismatch"
    log(f"bit-exact OK (ML={ML})")

    def make(K):
        @jax.jit
        def run(args):
            r, b0, nb = args

            def body(i, acc):
                o = dec(jnp.roll(r, i, axis=0), jnp.roll(b0, i, axis=0),
                        jnp.roll(nb, i, axis=0))
                return acc + o[0, 0].astype(jnp.int32) + o[-1, -1]
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    times = {}
    for K in (K1, K2):
        f = make(K)
        t0 = time.time()
        int(f((jrows, jbit0, jnbits)))
        log(f"K={K}: compile+first {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            int(f((jrows, jbit0, jnbits)))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
        log(f"K={K}: best {best*1e3:.1f}ms")
    per = (times[K2] - times[K1]) / (K2 - K1)
    log(f"per-iter {per*1e3:.3f}ms -> {n/max(per,1e-9)/1e9:.2f} GB/s")


if __name__ == "__main__":
    main()

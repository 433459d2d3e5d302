"""r5: decode G sweep re-check — today's device state vs the r4 s9 sweep
(16.24/16.27/16.93/16.26 at G=1/2/4/8).  Runs each G in-process by setting
pallas_decode.DEC_GROUPS and clearing the jit caches; BL=256, unroll 16,
honest consumption, 5 reps."""

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
from tpuhuff.dist import stitch_words
from tpuhuff.kernels import pallas_decode as pd
from tpuhuff.kernels.decode import (
    make_canonical_decode_tables, payload_to_lane_words,
)
from tpuhuff.kernels.encode import (
    encode_blocks, make_canonical_encode_tables, make_encode_tables,
)

MB = int(os.environ.get("BENCH_MB", "100"))
BL = 256
UNROLL = 16
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
    tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
    lens, codes = tree.encode_tables()
    dl, da = make_encode_tables(lens, codes)
    tabs = make_canonical_encode_tables(tree)
    Bd = n // BL
    wd, bd = encode_blocks(jnp.asarray(data.reshape(Bd, BL)), dl, da,
                           max_code_len=tabs[4], canon_tables=tabs[:4],
                           full_alphabet=tabs[5])
    bd_np = np.asarray(bd).astype(np.int64)
    payload, _ = stitch_words(np.asarray(wd), bd_np.astype(np.uint64))
    ends = np.cumsum(bd_np)
    starts = np.concatenate([[0], ends[:-1]])
    rows, bit0 = payload_to_lane_words(payload, starts, ends, BL)
    group = pd.SUB * pd.LANES
    Bp = -(-Bd // group) * group
    wpad = max(rows.shape[1], UNROLL + 1)
    rows_p = np.zeros((Bp, wpad), np.uint32)
    rows_p[:Bd, : rows.shape[1]] = rows
    bit0_p = np.zeros(Bp, np.int32)
    bit0_p[:Bd] = bit0
    nbits_p = np.zeros(Bp, np.int32)
    nbits_p[:Bd] = (ends - starts).astype(np.int32)
    ub, dd, perm4, ml = make_canonical_decode_tables(tree)
    jt = pd.make_fused_tables(ub, dd, perm4)
    jrows = jax.device_put(jnp.asarray(rows_p))
    jbit0 = jax.device_put(jnp.asarray(bit0_p))
    jnbits = jax.device_put(jnp.asarray(nbits_p))

    results = {}
    for G in (2, 4, 8):
        pd.DEC_GROUPS = G
        jax.clear_caches()

        @jax.jit
        def dec_run(args, K):
            r, b0, nb = args

            def body(i, acc):
                nb2 = nb.at[-1].add(-(i & 1))
                o = pd.decode_rows_fused(r, b0, nb2, *jt, ml, BL, UNROLL)
                w32 = jax.lax.bitcast_convert_type(
                    o.reshape(o.shape[0], o.shape[1] // 4, 4), jnp.uint32)
                return (acc + jnp.sum(w32.astype(jnp.int32))).astype(
                    jnp.int32) & 0xFFFF
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        out = np.asarray(pd.decode_rows_fused(jrows, jbit0, jnbits, *jt,
                                              ml, BL, UNROLL))
        assert np.array_equal(out[:Bd].reshape(-1), data), f"G={G} mismatch"
        times = {}
        for K in (K1, K2):
            t0 = time.time()
            int(dec_run((jrows, jbit0, jnbits), K))
            log(f"G={G} K={K}: compile+first {time.time()-t0:.1f}s")
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                int(dec_run((jrows, jbit0, jnbits), K))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        per = (times[K2] - times[K1]) / (K2 - K1)
        gbps = n / max(per, 1e-9) / 1e9
        log(f"G={G}: {per*1e3:.2f} ms/iter -> {gbps:.2f} GB/s")
        results[G] = round(gbps, 3)
    print(results)


if __name__ == "__main__":
    main()

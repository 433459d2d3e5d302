"""TPU session 13: gather-free Pallas v2 encoder on HW.

Session 12 found the stride-2 compaction lowers to lax.gather (Mosaic
rejects).  v2 now packs symbol pairs into int32 elements in XLA before the
kernel.  Measure: (a) remote compile, (b) HW bit parity, (c) amortized
K-slope throughput kernel-only and e2e-with-pack vs the 5.7-6.9 GB/s XLA
production path.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def ts():
    return time.strftime('%H:%M:%S')

print(f"[{ts()}] waiting for device...", flush=True)
t0 = time.time()
_ = float((jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum())
print(f"[{ts()}] device up after {time.time()-t0:.0f}s", flush=True)

from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.core.canonical import canonicalize
from tpuhuff.kernels.encode import (
    encode_blocks, make_encode_tables, make_canonical_encode_tables,
)
from tpuhuff.kernels.pallas_encode2 import (
    encode_blocks_pallas2, _encode_call, pack_pairs,
)

rng = np.random.default_rng(0)
n = 16 << 20
text = (
    b"the of and to in a is that it was for on are as with his they at "
    b"<page><title>Benchmark</title><revision><text xml:space=\"preserve\">"
    b"In information theory, a Huffman code is a particular type of optimal "
    b"prefix code that is commonly used for lossless data compression. "
)
data = np.frombuffer(text * (n // len(text) + 1), dtype=np.uint8)[:n].copy()
idx = rng.integers(0, n, n // 64)
data[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)
tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
lens_t, codes_t = tree.encode_tables()
ML = int(lens_t.max())
dl, da = make_encode_tables(lens_t, codes_t)
canon = make_canonical_encode_tables(tree)
ct = canon[:4]
print(f"[{ts()}] tree ML={ML}", flush=True)

inv4 = jnp.asarray(np.asarray(ct[0], np.uint32).reshape(1, 64))
pres = jnp.asarray(np.asarray(ct[1], np.uint32).reshape(1, 8))
cumle32 = np.zeros((1, 32), np.int32)
cumle32[0, : np.asarray(ct[2]).size] = np.asarray(ct[2])
dd32 = np.zeros((1, 32), np.int32)
dd32[0, : np.asarray(ct[3]).size] = np.asarray(ct[3])
cumle32, dd32 = jnp.asarray(cumle32), jnp.asarray(dd32)


def run_shape(N):
    B = n // N
    blocks = data[: B * N].reshape(B, N)
    # correctness on a small slice first (cheap compile at same N, tiny B)
    Bs = 256
    t0 = time.time()
    try:
        w, bl = encode_blocks_pallas2(jnp.asarray(blocks[:Bs]), ct, ML)
        w, bl = np.asarray(w), np.asarray(bl)
    except Exception as e:
        print(f"  N={N} SMALL COMPILE FAIL: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    wr, br = encode_blocks(jnp.asarray(blocks[:Bs]), dl, da,
                           max_code_len=ML, canon_tables=ct)
    wr, br = np.asarray(wr), np.asarray(br)
    ok = np.array_equal(bl, br) and all(
        np.array_equal(w[i, : (bl[i] + 31) // 32], wr[i, : (br[i] + 31) // 32])
        for i in range(Bs))
    print(f"  [{ts()}] N={N} small(B={Bs}): compile+run {time.time()-t0:.1f}s parity={'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        return

    jb = jnp.asarray(blocks)
    t0 = time.time()
    try:
        w, bl = encode_blocks_pallas2(jb, ct, ML)
        _ = int(jnp.asarray(bl)[0])
    except Exception as e:
        print(f"  N={N} PROD COMPILE FAIL: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    print(f"  [{ts()}] N={N} prod(B={B}): compile+run {time.time()-t0:.1f}s", flush=True)

    data_t = jnp.asarray(np.ascontiguousarray(
        (blocks[:, 0::2].astype(np.int32) | (blocks[:, 1::2].astype(np.int32) << 8)).T))
    valid_t = jnp.full((1, B), N, jnp.int32)

    def make(K):
        # kernel-only loop; the e2e case builds its own closure below
        # (ADVICE r1: the old e2e branch here was dead — make_e2e shadowed it)
        @jax.jit
        def run(x):
            def body(i, acc):
                rolled = jnp.roll(x, i, axis=1)
                wo, bo = _encode_call(rolled, valid_t, inv4, pres, cumle32,
                                      dd32, N, ML, True, False)
                return acc + bo[0, 0] + bo[0, -1]
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    for e2e, label, x0 in ((False, "kernel", data_t),
                           (True, "e2e+pack", jnp.asarray(blocks.T.copy()))):
        if e2e:
            # roll over lanes = blocks; feed (N,B) then T inside
            x0 = jnp.asarray(blocks.T)  # (N,B); pack_pairs wants (B,N)

            def make_e2e(K):
                @jax.jit
                def run(x):
                    def body(i, acc):
                        rolled = jnp.roll(x, i, axis=1)
                        packed = pack_pairs(rolled.T)
                        wo, bo = _encode_call(packed, valid_t, inv4, pres,
                                              cumle32, dd32, N, ML, True,
                                              False)
                        return acc + bo[0, 0] + bo[0, -1]
                    return jax.lax.fori_loop(0, K, body, jnp.int32(0))
                return run
            mk = make_e2e
        else:
            mk = lambda K: make(K)
        tms = {}
        try:
            for K in (2, 16):
                f = mk(K)
                t0 = time.time()
                int(f(x0))
                print(f"    [{ts()}] {label} K={K} compile+first {time.time()-t0:.1f}s", flush=True)
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    int(f(x0))
                    best = min(best, time.perf_counter() - t0)
                tms[K] = best
        except Exception as e:
            print(f"    {label} FAIL: {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        per = (tms[16] - tms[2]) / 14
        print(f"  N={N} {label}: {per*1e3:.2f} ms/iter = {n/per/1e9:.2f} GB/s", flush=True)


for N in (512, 1024, 256):
    run_shape(N)

print("ALL DONE", flush=True)

"""TPU session 12: Pallas v2 fused-canonical encoder on HW.

v2 (kernels/pallas_encode2.py) fuses the canonical ladder LUT into the
VMEM merge kernel and halves the merge rows when 2*ML <= 32.  Interpret
parity is pinned by tests/test_pallas_encode2.py; this session checks
(a) remote compile at production shapes, (b) bit parity on HW,
(c) amortized K-slope throughput vs the production XLA path (7.1 GB/s).
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
from tpuhuff.kernels.pallas_encode2 import encode_blocks_pallas2, _encode_call

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


def run_shape(N, small_first=True):
    B = n // N
    blocks = data[: B * N].reshape(B, N)
    # correctness on a small slice first (cheap compile at same N, tiny B)
    if small_first:
        Bs = 256
        t0 = time.time()
        try:
            w, bl = encode_blocks_pallas2(jnp.asarray(blocks[:Bs]), ct, ML)
            w, bl = np.asarray(w), np.asarray(bl)
        except Exception as e:
            print(f"  N={N} SMALL COMPILE FAIL: {type(e).__name__}: {str(e)[:200]}", flush=True)
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

    # production shape: full 16 MiB
    jb = jnp.asarray(blocks)
    t0 = time.time()
    try:
        w, bl = encode_blocks_pallas2(jb, ct, ML)
        _ = int(jnp.asarray(bl)[0])
    except Exception as e:
        print(f"  N={N} PROD COMPILE FAIL: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    print(f"  [{ts()}] N={N} prod(B={B}): compile+run {time.time()-t0:.1f}s", flush=True)

    # amortized throughput on the kernel-layout arrays (skip transposes)
    inv4 = jnp.asarray(np.asarray(ct[0], np.uint32).reshape(1, 64))
    pres = jnp.asarray(np.asarray(ct[1], np.uint32).reshape(1, 8))
    cumle32 = np.zeros((1, 32), np.int32)
    cumle32[0, : np.asarray(ct[2]).size] = np.asarray(ct[2])
    dd32 = np.zeros((1, 32), np.int32)
    dd32[0, : np.asarray(ct[3]).size] = np.asarray(ct[3])
    cumle32, dd32 = jnp.asarray(cumle32), jnp.asarray(dd32)
    data_t = jnp.asarray(blocks.T.astype(np.int32))
    valid_t = jnp.full((1, B), N, jnp.int32)

    def make(K):
        @jax.jit
        def run(dt):
            def body(i, acc):
                rolled = jnp.roll(dt, i, axis=1)
                wo, bo = _encode_call(rolled, valid_t, inv4, pres, cumle32,
                                      dd32, ML, False)
                return acc + bo[0, 0] + bo[0, -1]
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    tms = {}
    for K in (2, 16):
        f = make(K)
        t0 = time.time()
        int(f(data_t))
        print(f"    [{ts()}] K={K} compile+first {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            int(f(data_t))
            best = min(best, time.perf_counter() - t0)
        tms[K] = best
    per = (tms[16] - tms[2]) / 14
    print(f"  N={N}: {per*1e3:.2f} ms/iter = {n/per/1e9:.2f} GB/s (kernel only, no hist)", flush=True)


for N in (512, 256, 1024):
    run_shape(N)

print("ALL DONE", flush=True)

"""TPU session 11: Pallas v2 encode (fused canonical LUT + bounded merge).

Risks to clear: stride-2 row slice (L0 compaction) and scalar-table select
trees under this Mosaic backend.  Then amortized e2e throughput vs the XLA
7.1 GB/s.
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
    encode_blocks, make_canonical_encode_tables, make_encode_tables,
)
from tpuhuff.kernels.pallas_encode2 import encode_blocks_pallas2

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
tabs = make_canonical_encode_tables(tree)
print(f"[{ts()}] canonical tree ML={ML}", flush=True)


def slope(make, arr, K1=2, K2=8):
    rs = {}
    for K in (K1, K2):
        f = make(K)
        tc = time.time(); int(f(arr))
        print(f"    [{ts()}] K={K} compile+run {time.time()-tc:.1f}s", flush=True)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter(); int(f(arr)); best = min(best, time.perf_counter()-t0)
        rs[K] = best
    return (rs[K2]-rs[K1])/(K2-K1)


for N in (512, 256, 1024):
    B = n // N
    blocks = jnp.asarray(data.reshape(B, N))
    # correctness at small B first, then full
    try:
        w_ref, b_ref = encode_blocks(blocks[:256], dl, da, gather_free=True,
                                     max_code_len=ML)
        w, b = encode_blocks_pallas2(blocks[:256], tabs[:4], ML)
        w, b = np.asarray(w), np.asarray(b)
        w_ref, b_ref = np.asarray(w_ref), np.asarray(b_ref)
        m = min(w.shape[1], w_ref.shape[1])
        ok = (np.array_equal(b, b_ref) and np.array_equal(w[:, :m], w_ref[:, :m])
              and not w[:, m:].any() and not w_ref[:, m:].any())
        print(f"p2 N={N} correctness: {'OK' if ok else 'MISMATCH'}", flush=True)
        def make(K):
            @jax.jit
            def run(x):
                def body(i, acc):
                    w, b = encode_blocks_pallas2(jnp.roll(x, i, axis=0), tabs[:4], ML)
                    return acc + b[0].astype(jnp.int64) + b[-1].astype(jnp.int64) + w[0, 0].astype(jnp.int64)
                return jax.lax.fori_loop(0, K, body, jnp.int64(0))
            return run
        per = slope(make, blocks)
        print(f"p2 N={N:5d}: {per*1e3:.2f} ms/iter = {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"p2 N={N}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)
print("ALL DONE", flush=True)

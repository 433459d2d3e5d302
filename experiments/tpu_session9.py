"""TPU session 9: canonical ladder decoder on HW + encode N sweep (transposed).

s8: transposed decode = no change (op-count/dispatch-bound, not layout);
the canonical decoder cuts ~390 -> ~110 VPU ops/symbol.  Also finish the
transposed encode N sweep (5.11 GB/s at N=256 so far).
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
from tpuhuff.kernels.encode import encode_blocks, make_encode_tables
from tpuhuff.kernels.decode import (
    decode_blocks_canonical, make_canonical_decode_tables,
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
ub, dd, perm4, ml = make_canonical_decode_tables(tree)
print(f"[{ts()}] canonical tree ML={ML}", flush=True)


def slope(make, arr, K1=1, K2=3):
    rs = {}
    for K in (K1, K2):
        f = make(K)
        tc = time.time(); int(f(arr))
        print(f"    [{ts()}] K={K} compile+run {time.time()-tc:.1f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); int(f(arr)); best = min(best, time.perf_counter()-t0)
        rs[K] = best
    return (rs[K2]-rs[K1])/(K2-K1)


# ---- canonical decode sweep ----
def prep_dec(BL):
    Bd = n // BL
    w, bl = encode_blocks(jnp.asarray(data.reshape(Bd, BL)), dl, da,
                          gather_free=True, max_code_len=ML, transposed=True)
    w = np.asarray(w); bl = np.asarray(bl).astype(np.int64)
    Wmax = int(((bl + 31) // 32).max()) + 1
    rows = np.zeros((Bd, Wmax), dtype=np.uint32)
    m = min(w.shape[1], Wmax)
    rows[:, :m] = w[:, :m]
    return (jnp.asarray(rows), jnp.zeros(Bd, jnp.int32),
            jnp.asarray(bl.astype(np.int32)))

for BL, S, T in ((256, 8, True), (128, 8, True), (64, 8, True),
                 (64, 16, True), (64, 8, False), (32, 8, True)):
    try:
        rows_j, bit0, nbits = prep_dec(BL)
        out = np.asarray(decode_blocks_canonical(
            rows_j[:64], bit0[:64], nbits[:64], ub, dd, perm4, ml, BL,
            unroll=S, transposed=T))
        ok = np.array_equal(out, data.reshape(-1, BL)[:64])
        def make(K):
            @jax.jit
            def run(r):
                def body(i, acc):
                    o = decode_blocks_canonical(jnp.roll(r, i, axis=0), bit0,
                                                nbits, ub, dd, perm4, ml, BL,
                                                unroll=S, transposed=T)
                    return acc + o[0, 0].astype(jnp.int32) + o[-1, -1].astype(jnp.int32)
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        per = slope(make, rows_j)
        print(f"decC BL={BL:4d} S={S:2d} T={int(T)}: {'OK' if ok else 'MISMATCH'} "
              f"{per*1e3:.2f} ms/iter = {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"decC BL={BL} S={S} T={int(T)}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)

# ---- encode transposed N sweep ----
for N in (128, 512):
    B = n // N
    blocks = jnp.asarray(data.reshape(B, N))
    try:
        def make(K):
            @jax.jit
            def run(x):
                def body(i, acc):
                    w, b = encode_blocks(jnp.roll(x, i, axis=0), dl, da,
                                         gather_free=True, max_code_len=ML,
                                         transposed=True)
                    return acc + b[0].astype(jnp.int64) + b[-1].astype(jnp.int64) + w[0, 0].astype(jnp.int64)
                return jax.lax.fori_loop(0, K, body, jnp.int64(0))
            return run
        per = slope(make, blocks)
        print(f"encT N={N:5d}: {per*1e3:.2f} ms/iter = {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"encT N={N}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)
print("ALL DONE", flush=True)

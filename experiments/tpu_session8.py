"""TPU session 8: blocks-in-lanes (transposed) layouts for both kernels.

Session 7 showed the (B, W) layout pads W up to 128 lanes — the real cap.
Measure transposed encode at N in {256, 1024} and transposed decode over
(BL, S), incl. S=16.
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
from tpuhuff.kernels.encode import encode_blocks, make_encode_tables
from tpuhuff.kernels.decode import decode_blocks_device, make_decode_tables

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
tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
lens_t, codes_t = tree.encode_tables()
ML = int(lens_t.max())
dl, da = make_encode_tables(lens_t, codes_t)
thr, sym4, len4 = make_decode_tables(tree)
print(f"[{ts()}] tree ML={ML}", flush=True)


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


# ---- encode: transposed vs normal ----
for N in (256, 1024):
    B = n // N
    blocks = jnp.asarray(data.reshape(B, N))
    # correctness on a slice
    w0, b0 = encode_blocks(blocks[:256], dl, da, gather_free=True, max_code_len=ML)
    w1, b1 = encode_blocks(blocks[:256], dl, da, gather_free=True, max_code_len=ML,
                           transposed=True)
    ok = np.array_equal(np.asarray(w0), np.asarray(w1)) and np.array_equal(
        np.asarray(b0), np.asarray(b1))
    print(f"encT N={N} correctness: {'OK' if ok else 'MISMATCH'}", flush=True)
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

# ---- decode transposed sweep ----
def prep_dec(BL):
    Bd = n // BL
    w, bl = encode_blocks(jnp.asarray(data.reshape(Bd, BL)), dl, da,
                          gather_free=True, max_code_len=ML)
    w = np.asarray(w); bl = np.asarray(bl).astype(np.int64)
    Wmax = int(((bl + 31) // 32).max()) + 1
    rows = np.zeros((Bd, Wmax), dtype=np.uint32)
    m = min(w.shape[1], Wmax)
    rows[:, :m] = w[:, :m]
    return (jnp.asarray(rows), jnp.zeros(Bd, jnp.int32),
            jnp.asarray(bl.astype(np.int32)))

for BL, S in ((512, 8), (256, 8), (256, 16), (128, 8), (128, 16), (64, 16)):
    try:
        rows_j, bit0, nbits = prep_dec(BL)
        out = np.asarray(decode_blocks_device(rows_j[:64], bit0[:64], nbits[:64],
                                              thr, sym4, len4, BL, unroll=S,
                                              transposed=True))
        ok = np.array_equal(out, data.reshape(-1, BL)[:64])
        def make(K):
            @jax.jit
            def run(r):
                def body(i, acc):
                    o = decode_blocks_device(jnp.roll(r, i, axis=0), bit0, nbits,
                                             thr, sym4, len4, BL, unroll=S,
                                             transposed=True)
                    return acc + o[0, 0].astype(jnp.int32) + o[-1, -1].astype(jnp.int32)
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        per = slope(make, rows_j)
        print(f"decT BL={BL:4d} S={S:2d}: {'OK' if ok else 'MISMATCH'} "
              f"{per*1e3:.2f} ms/iter = {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"decT BL={BL} S={S}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)
print("ALL DONE", flush=True)

"""TPU session 6: Pallas pack at production shape (N=1024 + grid).

Session 5 isolated the remote-compile crash to N=2048 (N=1024 ungridded OK,
grids OK).  Here: (1) N=1024 with a real grid, correctness vs the XLA
merge; (2) amortized e2e encode throughput at 16 MiB; (3) pack-only
throughput; (4) decode at block_len=128 to confirm the 1/block_len scaling.
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
from tpuhuff.kernels.pallas_encode import pack_blocks_pallas, encode_blocks_pallas

rng = np.random.default_rng(0)
MB = 16
n = MB << 20
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
print(f"[{ts()}] tree ML={ML}", flush=True)

N = 1024

# ---- 1. correctness: pallas vs XLA merge, N=1024, grid ----
for B in (128, 512):
    blocks = jnp.asarray(data[: B * N].reshape(B, N))
    try:
        wp, bp = encode_blocks_pallas(blocks, dl, da)
        wp, bp = np.asarray(wp), np.asarray(bp)
        wx, bx = encode_blocks(blocks, dl, da, gather_free=True, max_code_len=ML)
        wx, bx = np.asarray(wx), np.asarray(bx)
        okb = np.array_equal(bp, bx)
        m = min(wp.shape[1], wx.shape[1])
        okw = np.array_equal(wp[:, :m], wx[:, :m]) and not wp[:, m:].any() and not wx[:, m:].any()
        print(f"pallas N={N} B={B} (grid={B//128}): bits {'OK' if okb else 'MISMATCH'} "
              f"words {'OK' if okw else 'MISMATCH'}", flush=True)
    except Exception as e:
        print(f"pallas N={N} B={B}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)

# ---- 2. amortized e2e + pack-only at 16 MiB ----
Bfull = n // N  # 16384 lanes -> grid 128
blocks_full = jnp.asarray(data.reshape(Bfull, N))

def amortized(name, fn, arr, bytes_per_iter, K1=1, K2=3):
    try:
        def make(K):
            @jax.jit
            def run(x):
                def body(i, acc):
                    w, b = fn(jnp.roll(x, i, axis=0))
                    return acc + b[0].astype(jnp.int64) + b[-1].astype(jnp.int64) + w[0, 0].astype(jnp.int64)
                return jax.lax.fori_loop(0, K, body, jnp.int64(0))
            return run
        rs = {}
        for K in (K1, K2):
            f = make(K)
            tc = time.time(); int(f(arr))
            print(f"  [{ts()}] {name} K={K} compile+run {time.time()-tc:.1f}s", flush=True)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter(); int(f(arr)); best = min(best, time.perf_counter()-t0)
            rs[K] = best
        per = (rs[K2]-rs[K1])/(K2-K1)
        print(f"{name}: {per*1e3:.2f} ms/iter = {bytes_per_iter/max(per,1e-9)/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)

amortized("pallas-e2e-16MiB", lambda x: encode_blocks_pallas(x, dl, da), blocks_full, n)
amortized("xla-e2e-16MiB", lambda x: encode_blocks(x, dl, da, gather_free=True, max_code_len=ML), blocks_full, n)

# pack-only: fixed LUT'd inputs (transposed layout the kernel wants)
from tpuhuff.kernels.encode import _lut_lookup
lens_l, acodes_l = _lut_lookup(blocks_full, dl, da, True)
ac_t = jnp.asarray(np.asarray(acodes_l).T.copy())
ln_t = jnp.asarray(np.asarray(lens_l).T.copy())

def pack_only(x):
    w, b = pack_blocks_pallas(x, ln_t)
    return w.T, b[0]

amortized("pallas-pack-16MiB", pack_only, ac_t, n)

# ---- 3. decode at block_len=128 ----
from tpuhuff.kernels.decode import decode_blocks_device, make_decode_tables
thr, sym4, len4 = make_decode_tables(tree)
BL = 128
Bd = n // BL
w, bl = encode_blocks(jnp.asarray(data.reshape(Bd, BL)), dl, da,
                      gather_free=True, max_code_len=ML)
w = np.asarray(w); bl = np.asarray(bl).astype(np.int64)
Wmax = int(((bl + 31) // 32).max()) + 1
rows = np.zeros((Bd, Wmax), dtype=np.uint32)
m = min(w.shape[1], Wmax)
rows[:, :m] = w[:, :m]
rows_j = jnp.asarray(rows); bit0 = jnp.zeros(Bd, jnp.int32); nbits = jnp.asarray(bl.astype(np.int32))
out = np.asarray(decode_blocks_device(rows_j[:64], bit0[:64], nbits[:64], thr, sym4, len4, BL))
print(f"decode correctness BL={BL}: {'OK' if np.array_equal(out, data.reshape(-1, BL)[:64]) else 'MISMATCH'}", flush=True)

def dec(x):
    o = decode_blocks_device(x, bit0, nbits, thr, sym4, len4, BL)
    return o, o[0, :2].astype(jnp.int32)

def amortized_dec(name, K1=1, K2=3):
    def make(K):
        @jax.jit
        def run(r):
            def body(i, acc):
                out = decode_blocks_device(jnp.roll(r, i, axis=0), bit0, nbits, thr, sym4, len4, BL)
                return acc + out[0, 0].astype(jnp.int32) + out[-1, -1].astype(jnp.int32)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run
    rs = {}
    for K in (K1, K2):
        f = make(K)
        tc = time.time(); int(f(rows_j))
        print(f"  [{ts()}] {name} K={K} compile+run {time.time()-tc:.1f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); int(f(rows_j)); best = min(best, time.perf_counter()-t0)
        rs[K] = best
    per = (rs[K2]-rs[K1])/(K2-K1)
    print(f"{name}: {per*1e3:.2f} ms/iter = {n/max(per,1e-9)/1e9:.2f} GB/s (decoded)", flush=True)

try:
    amortized_dec(f"dec-{BL}")
except Exception as e:
    print(f"dec-{BL}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)
print("ALL DONE", flush=True)

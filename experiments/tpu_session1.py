"""One patient TPU session: recovery wait, amortized timings, pallas test.

Run in background with NO timeout. Never kill it.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

print(f"[{time.strftime('%H:%M:%S')}] waiting for device...", flush=True)
t0 = time.time()
x = jnp.ones((128, 128))
v = float((x @ x).sum())
print(f"[{time.strftime('%H:%M:%S')}] device up after {time.time()-t0:.0f}s", flush=True)

from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels.encode import encode_blocks, make_encode_tables
from tpuhuff.kernels.histogram import histogram
from tpuhuff.kernels.pallas_encode import encode_blocks_pallas

rng = np.random.default_rng(0)
MB = 16
n = MB << 20
data = rng.integers(0, 64, n, dtype=np.uint8)
tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
dl, da = make_encode_tables(*tree.encode_tables())
B, N = n // 2048, 2048
blocks = jnp.asarray(data.reshape(B, N))
print(f"[{time.strftime('%H:%M:%S')}] uploaded {MB}MB as {B}x{N}", flush=True)

def amortized(name, one_iter, K1=1, K2=5):
    def make(K):
        @jax.jit
        def run(b):
            return jax.lax.fori_loop(0, K, lambda i, a: a + one_iter(b, i),
                                     jnp.int32(0))
        return run
    rs = {}
    try:
        for K in (K1, K2):
            f = make(K)
            int(f(blocks))
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter(); int(f(blocks))
                best = min(best, time.perf_counter() - t0)
            rs[K] = best
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    per = (rs[K2] - rs[K1]) / (K2 - K1)
    print(f"{name}: t{K1}={rs[K1]*1e3:.1f}ms t{K2}={rs[K2]*1e3:.1f}ms -> "
          f"{per*1e3:.2f}ms/iter = {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)
    return per

def vary(b, i):
    return jnp.roll(b, i, axis=0)

amortized("pass+sum ", lambda b, i: jnp.sum(vary(b, i).astype(jnp.int32)) & 0xFFFF)
amortized("hist     ", lambda b, i: histogram(vary(b, i))[0] & 0xFFFF)
amortized("take-lut ", lambda b, i: (jnp.sum(jnp.take(dl, vary(b, i).astype(jnp.int32))) & 0xFFFF).astype(jnp.int32))

def full_xla(b, i):
    w, bits = encode_blocks(vary(b, i), dl, da)
    return (jnp.sum(bits) & 0xFFFF).astype(jnp.int32)
amortized("xla-enc  ", full_xla, K1=1, K2=3)

def full_pallas(b, i):
    w, bits = encode_blocks_pallas(vary(b, i), dl, da)
    return (jnp.sum(bits) & 0xFFFF).astype(jnp.int32)
amortized("pallas-enc", full_pallas, K1=1, K2=3)

# correctness of pallas on real hardware (not interpret)
try:
    w, b = encode_blocks_pallas(blocks[:128], dl, da)
    wr, br = encode_blocks(blocks[:128], dl, da)
    ok = np.array_equal(np.asarray(b), np.asarray(br)) and np.array_equal(
        np.asarray(w), np.asarray(wr))
    print(f"pallas-vs-xla on hardware: correct={ok}", flush=True)
except Exception as e:
    print(f"pallas hw check FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

# pallas merge-only (LUT outside): how fast is the kernel alone?
acodes = jnp.take(da, blocks.astype(jnp.int32), axis=0)
lens_arr = jnp.take(dl, blocks.astype(jnp.int32), axis=0)
from tpuhuff.kernels.pallas_encode import pack_blocks_pallas
at = jnp.asarray(np.ascontiguousarray(np.asarray(acodes).T))
lt = jnp.asarray(np.ascontiguousarray(np.asarray(lens_arr).T))
def pallas_merge_only(b, i):
    del b
    w, bits = pack_blocks_pallas(jnp.roll(at, i, axis=1), jnp.roll(lt, i, axis=1))
    return (jnp.sum(bits) & 0xFFFF).astype(jnp.int32)
amortized("pallas-merge-only", pallas_merge_only, K1=1, K2=3)

print("ALL DONE", flush=True)

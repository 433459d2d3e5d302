"""TPU session 4: pallas pack kernel at production shapes + width-bounded merge.

Session 3 found: sel-lut 50 GB/s, XLA merge 0.87 GB/s (the bottleneck),
pallas kernel compiles at N=64 ungridded.  This session:
  1. pallas correctness vs XLA encoder on device (gridded, N=2048).
  2. pallas pack timing at 16 MiB (grid over lanes).
  3. width-bounded XLA merge timing (max_code_len path).
  4. full e2e: select-LUT + pallas pack.
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
from tpuhuff.core.codec import pack_codes_u8
from tpuhuff.kernels.encode import encode_blocks, make_encode_tables, words_to_payload
from tpuhuff.kernels.pallas_encode import encode_blocks_pallas

rng = np.random.default_rng(0)
MB = 16
n = MB << 20
# enwik-like text mix (same as bench.py)
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
print(f"max code len: {ML}", flush=True)
dl, da = make_encode_tables(lens_t, codes_t)
BL = 2048
B = n // BL
print(f"[{ts()}] uploading {MB} MiB as {B}x{BL}...", flush=True)
blocks = jax.device_put(jnp.asarray(data.reshape(B, BL)))
_ = int(jnp.sum(blocks[0].astype(jnp.int32)))
print(f"[{ts()}] upload done", flush=True)

# ---- 1. pallas correctness on device (128 blocks, gridded path) ----
try:
    w, b = encode_blocks_pallas(blocks[:256], dl, da)
    wr, br = encode_blocks(blocks[:256], dl, da)
    okb = np.array_equal(np.asarray(b), np.asarray(br))
    ok = all(
        words_to_payload(np.asarray(w[i]), int(b[i]))
        == words_to_payload(np.asarray(wr[i]), int(br[i]))
        for i in range(0, 256, 37)
    )
    print(f"pallas vs xla on device: bits={'OK' if okb else 'BAD'} words={'OK' if ok else 'BAD'}", flush=True)
except Exception as e:
    print(f"pallas correctness: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)


def amortized(name, one_iter, K1=1, K2=3):
    try:
        def make(K):
            @jax.jit
            def run(bk):
                return jax.lax.fori_loop(0, K, lambda i, a: a + one_iter(bk, i), jnp.int32(0))
            return run
        rs = {}
        for K in (K1, K2):
            f = make(K)
            tc = time.time(); int(f(blocks))
            print(f"  [{ts()}] {name} K={K} compile+run {time.time()-tc:.1f}s", flush=True)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter(); int(f(blocks)); best = min(best, time.perf_counter()-t0)
            rs[K] = best
        per = (rs[K2]-rs[K1])/(K2-K1)
        print(f"{name}: {per*1e3:.2f} ms/iter = {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)


# ---- 2. width-bounded XLA merge e2e ----
def enc_ml(bk, i):
    w, bits = encode_blocks(jnp.roll(bk, i, axis=0), dl, da, max_code_len=ML)
    return ((jnp.sum(bits) + jnp.sum(w[:, -1].astype(jnp.int32))) & 0xFFFF).astype(jnp.int32)
amortized("enc-xla-ml", enc_ml)

# ---- 3. pallas e2e (select-LUT + VMEM merge) ----
def enc_pl(bk, i):
    w, bits = encode_blocks_pallas(jnp.roll(bk, i, axis=0), dl, da)
    return ((jnp.sum(bits) + jnp.sum(w[:, -1].astype(jnp.int32))) & 0xFFFF).astype(jnp.int32)
amortized("enc-pallas", enc_pl)

# ---- 4. pallas e2e + histogram (full pipeline like bench.py) ----
from tpuhuff.kernels.histogram import histogram
def enc_pl_h(bk, i):
    r = jnp.roll(bk, i, axis=0)
    h = histogram(r)
    w, bits = encode_blocks_pallas(r, dl, da)
    return ((jnp.sum(bits) + h[0]) & 0xFFFF).astype(jnp.int32)
amortized("pipe-pallas", enc_pl_h)

print("ALL DONE", flush=True)

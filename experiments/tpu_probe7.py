"""TPU probe 7: REAL device times via in-jit fori amortization.

The tunnel has a ~30ms dispatch floor and lazy block_until_ready, so each
measured program runs K iterations inside one jit, varying inputs
device-side (roll) and accumulating a scalar that is fetched once.
device_time = (t_K2 - t_K1) / (K2 - K1) cancels the floor exactly.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
MB = 16
n = MB << 20

from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels.encode import encode_blocks, make_encode_tables
from tpuhuff.kernels.histogram import histogram

data = rng.integers(0, 64, n, dtype=np.uint8)
tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
dl, da = make_encode_tables(*tree.encode_tables())
B, N = n // 16384, 16384
blocks = jnp.asarray(data.reshape(B, N))

def amortized(name, one_iter, K1=2, K2=6):
    """one_iter(blocks, i) -> scalar contribution."""
    def make(K):
        @jax.jit
        def run(b):
            def body(i, acc):
                return acc + one_iter(b, i)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run
    rs = {}
    try:
        for K in (K1, K2):
            f = make(K)
            s = int(f(blocks))  # compile+warm, result fetch forces completion
            t0 = time.perf_counter(); s = int(f(blocks)); t1 = time.perf_counter()
            t0b = time.perf_counter(); s = int(f(blocks)); t1b = time.perf_counter()
            rs[K] = min(t1 - t0, t1b - t0b)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return
    per = (rs[K2] - rs[K1]) / (K2 - K1)
    print(f"{name}: t{K1}={rs[K1]*1e3:.1f}ms t{K2}={rs[K2]*1e3:.1f}ms -> "
          f"{per*1e3:.2f}ms/iter = {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)

def vary(b, i):
    # cheap device-side variation: add i mod 64 (stays in-alphabet for LUTs)
    return (b + (i % 64).astype(jnp.uint8)) % 64

# 1. baseline: one elementwise pass + reduce
amortized("pass+sum", lambda b, i: jnp.sum(vary(b, i).astype(jnp.int32)) & 0xFFFF)

# 2. hist
amortized("hist", lambda b, i: histogram(vary(b, i))[0] & 0xFFFF)

# 3. take-LUT
def lut_take(b, i):
    v = vary(b, i).astype(jnp.int32)
    return (jnp.sum(jnp.take(dl, v)) & 0xFFFF).astype(jnp.int32)
amortized("take-lut", lut_take)

# 4. one-hot matmul LUT
def lut_oh(b, i):
    v = vary(b, i)
    hi = (v >> 4).astype(jnp.int32); lo = (v & 15).astype(jnp.int32)
    i16 = jnp.arange(16, dtype=jnp.int32)
    T = dl.astype(jnp.float32).reshape(16, 16)
    oh_hi = (hi[..., None] == i16).astype(jnp.bfloat16)
    oh_lo = (lo[..., None] == i16).astype(jnp.float32)
    mid = jax.lax.dot_general(oh_hi, T.astype(jnp.bfloat16),
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    vals = jnp.sum(mid * oh_lo, axis=-1)
    return (jnp.sum(vals).astype(jnp.int32)) & 0xFFFF
amortized("onehot-lut", lut_oh)

# 5. full encode (take-lut based)
def full(b, i):
    w, bits = encode_blocks(vary(b, i), dl, da)
    return (jnp.sum(bits) & 0xFFFF).astype(jnp.int32)
amortized("full-encode", full, K1=1, K2=3)

print("done", flush=True)

"""TPU probe 2: per-call overhead, gather costs, one-hot-matmul LUT, merge-only."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def timeit(fn, args_list, iters=6):
    for a in args_list:
        jax.block_until_ready(fn(*a))
    times = []
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        times.append(time.perf_counter() - t0)
    return min(times), sorted(times)[len(times)//2]

def report(name, fn, args_list, nbytes, iters=6):
    t0 = time.time(); jax.block_until_ready(fn(*args_list[0])); cs = time.time()-t0
    best, med = timeit(fn, args_list, iters)
    print(f"{name}: compile {cs:.1f}s best {best*1e3:.2f}ms ({nbytes/best/1e9:.2f} GB/s) med {med*1e3:.2f}ms", flush=True)

rng = np.random.default_rng(0)
n = 16 << 20
data = rng.integers(0, 64, n, dtype=np.uint8)
bufs = [jnp.asarray(np.roll(data, k)) for k in range(3)]

# 1. trivial: per-call floor
report("trivial-sum", jax.jit(lambda b: jnp.sum(b.astype(jnp.int32))), [(b,) for b in bufs], n)

# 1b. pipelined trivial: 8 calls, one sync — measures per-call overhead vs real
@jax.jit
def tsum(b): return jnp.sum(b.astype(jnp.int32))
jax.block_until_ready(tsum(bufs[0]))
t0=time.perf_counter()
outs=[tsum(bufs[k%3]) for k in range(8)]
jax.block_until_ready(outs)
print(f"pipelined trivial x8: {(time.perf_counter()-t0)*1e3:.2f}ms total", flush=True)

# 2. jnp.take LUT
lut = jnp.asarray(rng.integers(0, 2**31, 256, dtype=np.int32))
report("take-lut", jax.jit(lambda b: jnp.sum(jnp.take(lut, b.astype(jnp.int32)))), [(b,) for b in bufs], n)

# 3. nibble one-hot matmul LUT: values = OH_hi @ T · OH_lo rowsum
T = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
@jax.jit
def onehot_lut(b):
    hi = (b >> 4).astype(jnp.int32); lo = (b & 15).astype(jnp.int32)
    i16 = jnp.arange(16, dtype=jnp.int32)
    oh_hi = (hi[:, None] == i16).astype(jnp.bfloat16)
    oh_lo = (lo[:, None] == i16).astype(jnp.bfloat16)
    mid = jnp.dot(oh_hi, T.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    vals = jnp.sum(mid * oh_lo.astype(jnp.float32), axis=1)
    return jnp.sum(vals)
report("onehot-lut", onehot_lut, [(b,) for b in bufs], n)

# 4. take_along_axis gather: (lanes, W) rows, (lanes,) dynamic cols, 100 steps
lanes, W = 8192, 256
rows = jnp.asarray(rng.integers(0, 2**31, (lanes, W), dtype=np.int32))
idx0 = jnp.asarray(rng.integers(0, W, lanes, dtype=np.int32))
@jax.jit
def gather_steps(rows, idx):
    def body(c, _):
        i, acc = c
        v = jnp.take_along_axis(rows, (i % W)[:, None], axis=1)[:, 0]
        return (i + (v & 3) + 1, acc + v), None
    (i, acc), _ = jax.lax.scan(body, (idx, jnp.zeros(lanes, jnp.int32)), None, length=100)
    return jnp.sum(acc)
report("gather100x8192", gather_steps, [(rows, idx0)], lanes*100*4)

# 5. merge-only encode (no LUT): random lens/acodes direct
B, N = 256, 65536
lens_r = jnp.asarray(rng.integers(1, 12, (B, N), dtype=np.int32))
acodes_r = jnp.asarray((rng.integers(0, 2**32, (B, N), dtype=np.uint64) & 0xFFF00000).astype(np.uint32))
from tpuhuff.kernels.encode import _merge_level
@jax.jit
def merge_only(ac, ln):
    vals = ac[..., None]; cur = ln
    while vals.shape[-2] > 1:
        vals, cur = _merge_level(vals, cur)
    return jnp.sum(cur) + vals[0, 0, 0].astype(jnp.int32)
report("merge-only-16MB", merge_only, [(acodes_r, lens_r)], B*N)

# 6. int8 matmul sanity: peak-ish MXU (2048^3)
a8 = jnp.asarray(rng.integers(-127, 127, (4096, 4096), dtype=np.int8))
@jax.jit
def mm(a): return jnp.sum(jnp.dot(a, a, preferred_element_type=jnp.int32))
report("int8-matmul-4096", mm, [(a8,)], 2*4096**3)
print("done", flush=True)

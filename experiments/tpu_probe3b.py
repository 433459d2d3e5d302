"""TPU probe 3b: 2-D sublane gather forms + 2-D merge level."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(fn, args, iters=6, nbytes=0, name=""):
    try:
        t0 = time.time(); r = jax.block_until_ready(fn(*args)); cs = time.time()-t0
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}", flush=True)
        return None
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); jax.block_until_ready(fn(*args)); ts.append(time.perf_counter()-t0)
    best = min(ts)
    print(f"{name}: compile {cs:.1f}s best {best*1e3:.3f}ms"
          + (f" ({nbytes/best/1e9:.1f} GB/s)" if nbytes else ""), flush=True)
    return r

rng = np.random.default_rng(0)

# (a) take_along_axis (256,128) table, (R,128) idx, axis=0 — per-lane LUT
R = 4096  # 512K elements
table = jnp.asarray(np.tile(rng.integers(0, 2**31, (256, 1), dtype=np.int32), (1, 128)))
idx = jnp.asarray(rng.integers(0, 256, (R, 128), dtype=np.int32))
def k_a(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
@jax.jit
def f_a(t, i):
    return pl.pallas_call(k_a,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i)
r = timeit(f_a, (table, idx), nbytes=R*128, name="sublane-gather-LUT (4096x128 from 256x128)")
if r is not None:
    expect = np.asarray(table)[np.asarray(idx), 0]
    print("   correct:", np.array_equal(np.asarray(r), expect), flush=True)

# (b) window fetch: rows (1024,128), idx (8,128)
rows = jnp.asarray(rng.integers(0, 2**31, (1024, 128), dtype=np.int32))
widx = jnp.asarray(rng.integers(0, 1024, (8, 128), dtype=np.int32))
def k_b(r_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(r_ref[:], i_ref[:], axis=0)
@jax.jit
def f_b(r_, i):
    return pl.pallas_call(k_b,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(r_, i)
r = timeit(f_b, (rows, widx), name="window-fetch (8x128 from 1024x128)")
if r is not None:
    expect = np.take_along_axis(np.asarray(rows), np.asarray(widx), axis=0)
    print("   correct:", np.array_equal(np.asarray(r), expect), flush=True)

# (b2) many-step loop of window fetches (decode-like): 512 steps
def k_b2(r_ref, i_ref, o_ref):
    def body(s, acc):
        w = jnp.take_along_axis(r_ref[:], (i_ref[:] + s) & 1023, axis=0)
        return acc + w
    o_ref[:] = jax.lax.fori_loop(0, 512, body, jnp.zeros((8, 128), jnp.int32))
@jax.jit
def f_b2(r_, i):
    return pl.pallas_call(k_b2,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(r_, i)
timeit(f_b2, (rows, widx), nbytes=512*8*128*4, name="gather-loop 512 steps x (8x128)")

# (c) 2-D merge level: vals (2W, L) pairs folded... simplest: A,B separate
W, L = 8, 1024
A = jnp.asarray(rng.integers(0, 2**31, (W, L), dtype=np.uint32))
Bv = jnp.asarray(rng.integers(0, 2**31, (W, L), dtype=np.uint32))
la = jnp.asarray(rng.integers(0, 32*W, (1, L), dtype=np.int32))
def k_c(a_ref, b_ref, la_ref, o_ref):
    q = la_ref[:] >> 5
    r_ = (la_ref[:] & 31).astype(jnp.uint32)
    x = jnp.pad(b_ref[:], ((0, W), (0, 0)))
    step = 1
    while step <= W:
        rolled = jnp.pad(x, ((step, 0), (0, 0)))[:2*W, :]
        x = jnp.where(((q >> int(np.log2(step))) & 1) == 1, rolled, x)
        step *= 2
    prev = jnp.pad(x, ((1, 0), (0, 0)))[:2*W, :]
    lo = jnp.where(r_ == 0, jnp.uint32(0), prev << ((jnp.uint32(32) - r_) & 31))
    shifted = (x >> r_) | lo
    o_ref[:] = jnp.pad(a_ref[:], ((0, W), (0, 0))) | shifted
@jax.jit
def f_c(a, b, l):
    return pl.pallas_call(k_c,
        out_shape=jax.ShapeDtypeStruct((2*W, L), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b, l)
r = timeit(f_c, (A, Bv, la), nbytes=W*L*8, name=f"merge-level-2D (W{W},L{L})")
if r is not None:
    # numpy reference
    an, bn, ln = np.asarray(A), np.asarray(Bv), np.asarray(la)[0]
    out = np.zeros((2*W, L), dtype=np.uint64)
    for lane in range(L):
        big = 0
        for w_ in range(W):
            big = (big << 32) | int(bn[w_, lane])
        big >>= 0
        tot = int(ln[lane])
        full = 0
        for w_ in range(W):
            full = (full << 32) | int(an[w_, lane])
        res = (full << (32*W)) | (big >> (tot - 32*W) if tot > 32*W else big << (32*W - tot))
        for w_ in range(2*W):
            out[2*W-1-w_, lane] = (res >> (32*w_)) & 0xFFFFFFFF
    print("   correct:", np.array_equal(np.asarray(r).astype(np.uint64), out), flush=True)
print("done", flush=True)

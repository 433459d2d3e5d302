"""TPU probe 3: Pallas feasibility — in-kernel gather, merge-level cost."""
import sys, time, traceback
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(fn, args, iters=6, nbytes=0, name=""):
    try:
        t0 = time.time(); jax.block_until_ready(fn(*args)); cs = time.time()-t0
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return False
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); jax.block_until_ready(fn(*args)); ts.append(time.perf_counter()-t0)
    best = min(ts)
    print(f"{name}: compile {cs:.1f}s best {best*1e3:.3f}ms"
          + (f" ({nbytes/best/1e9:.1f} GB/s)" if nbytes else ""), flush=True)
    return True

rng = np.random.default_rng(0)

# (a) vector gather from a 256-entry VMEM LUT inside a kernel
def gather_kernel(lut_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(lut_ref[:], idx_ref[:], axis=0)

M = 512 * 1024
lut = jnp.asarray(rng.integers(0, 2**31, 256, dtype=np.int32))
idx = jnp.asarray(rng.integers(0, 256, (M//128, 128), dtype=np.int32))
@jax.jit
def g(lut, idx):
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(lut, idx)
timeit(g, (lut, idx), nbytes=M, name=f"pallas-take-256lut({M} elems)")

# (a2) one-dim gather formulated as indexing
def gather_kernel2(lut_ref, idx_ref, out_ref):
    out_ref[:] = lut_ref[idx_ref[:]]
@jax.jit
def g2(lut, idx):
    return pl.pallas_call(
        gather_kernel2,
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(lut, idx)
timeit(g2, (lut, idx), nbytes=M, name="pallas-index-256lut")

# (b) per-sublane dynamic gather: window fetch emulation rows (W, 128) lanes
def win_kernel(rows_ref, w_ref, out_ref):
    # rows (256, 128); w (1, 128) word indices per lane
    out_ref[:] = jnp.take_along_axis(rows_ref[:], w_ref[:], axis=0)
rows = jnp.asarray(rng.integers(0, 2**31, (256, 128), dtype=np.int32))
widx = jnp.asarray(rng.integers(0, 256, (1, 128), dtype=np.int32))
@jax.jit
def w(rows, widx):
    return pl.pallas_call(
        win_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(rows, widx)
timeit(w, (rows, widx), name="pallas-take_along-sublane")

# (c) one merge level in pallas: (G, W, 128) shift-or — cost of a VMEM pass
G, W, L = 2048, 2, 128
vals = jnp.asarray(rng.integers(0, 2**31, (G, W, L), dtype=np.uint32))
la = jnp.asarray(rng.integers(0, 32*W, (G, 1, L), dtype=np.int32))
def level_kernel(v_ref, la_ref, out_ref):
    A = v_ref[0::2]
    B = v_ref[1::2]
    lab = la_ref[0::2]
    q = lab >> 5
    r = (lab & 31).astype(jnp.uint32)
    x = jnp.pad(B, ((0,0),(0,W),(0,0)))
    step = 1
    while step <= W:
        rolled = jnp.pad(x, ((0,0),(step,0),(0,0)))[:, :2*W, :]
        x = jnp.where(((q >> int(np.log2(step))) & 1) == 1, rolled, x)
        step *= 2
    prev = jnp.pad(x, ((0,0),(1,0),(0,0)))[:, :2*W, :]
    rr = r
    lo = jnp.where(rr == 0, jnp.uint32(0), prev << ((jnp.uint32(32)-rr) & 31))
    shifted = (x >> rr) | lo
    A_ext = jnp.pad(A, ((0,0),(0,W),(0,0)))
    out_ref[:] = A_ext | shifted
@jax.jit
def lvl(vals, la):
    return pl.pallas_call(
        level_kernel,
        out_shape=jax.ShapeDtypeStruct((G//2, 2*W, L), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(vals, la)
timeit(lvl, (vals, la), nbytes=G*W*L*4, name="pallas-merge-level(G2048,W2,L128)")
print("done", flush=True)

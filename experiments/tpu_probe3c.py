"""TPU probe 3c: dynamic_gather (both dims) at kernel shapes + level cost."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(fn, args, iters=8, nbytes=0, name="", check=None):
    try:
        t0 = time.time(); r = jax.block_until_ready(fn(*args)); cs = time.time()-t0
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}", flush=True)
        return None
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); jax.block_until_ready(fn(*args)); ts.append(time.perf_counter()-t0)
    best = min(ts)
    msg = f"{name}: compile {cs:.1f}s best {best*1e3:.3f}ms"
    if nbytes: msg += f" ({nbytes/best/1e9:.1f} GB/s)"
    if check is not None:
        msg += f" correct={bool(check(np.asarray(r)))}"
    print(msg, flush=True)
    return r

rng = np.random.default_rng(0)
R, C = 256, 2048   # tile shape: words x groups (2 MB u32)

x = jnp.asarray(rng.integers(0, 2**31, (R, C), dtype=np.int32))

# (a) sublane-dim gather: out[r,c] = x[idx[r,c], c]
idx_s = jnp.asarray(rng.integers(0, R, (R, C), dtype=np.int32))
def k_s(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
@jax.jit
def f_s(x, i):
    return pl.pallas_call(k_s,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, i)
xs, iss = np.asarray(x), np.asarray(idx_s)
timeit(f_s, (x, idx_s), nbytes=R*C*4, name=f"sublane-gather ({R}x{C})",
       check=lambda r: np.array_equal(r, np.take_along_axis(xs, iss, axis=0)))

# (b) lane-dim gather: out[r,c] = x[r, idx[r,c]]
idx_l = jnp.asarray(rng.integers(0, C, (R, C), dtype=np.int32))
def k_l(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
@jax.jit
def f_l(x, i):
    return pl.pallas_call(k_l,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, i)
il = np.asarray(idx_l)
timeit(f_l, (x, idx_l), nbytes=R*C*4, name=f"lane-gather ({R}x{C})",
       check=lambda r: np.array_equal(r, np.take_along_axis(xs, il, axis=1)))

# (c) LUT via lane gather: bytes (8, 8192) into table (8, 8192) [LUT rep 256]
data = jnp.asarray(rng.integers(0, 256, (64, 2048), dtype=np.int32))
lut256 = rng.integers(0, 2**31, 256, dtype=np.int32)
table = jnp.asarray(np.tile(lut256, (64, 2048 // 256)))
def k_lut(t_ref, d_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], d_ref[:], axis=1)
@jax.jit
def f_lut(t, d):
    return pl.pallas_call(k_lut,
        out_shape=jax.ShapeDtypeStruct((64, 2048), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, d)
dn = np.asarray(data)
timeit(f_lut, (table, data), nbytes=64*2048, name="LUT lane-gather (64x2048)",
       check=lambda r: np.array_equal(r, lut256[dn]))

# (d) elementwise pass cost baseline: 10 chained ops on (512, 8192)
def k_e(x_ref, o_ref):
    v = x_ref[:]
    for _ in range(10):
        v = (v >> 1) ^ (v + 7)
    o_ref[:] = v
@jax.jit
def f_e(x):
    return pl.pallas_call(k_e,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
timeit(f_e, (x,), nbytes=R*C*4*10, name="10x elementwise (RxC)")
print("done", flush=True)

"""r3 s5: histogram input-chain variants at 100MiB (the 2.36 GB/s cliff).

V2: (m,128,4)u8 -> bitcast -> (m,128)u32  (3D bitcast, no flat intermediate)
V3: u8-input kernel: (1024,128)u8 tile per cell, cast in-kernel, no bitcast
"""
import functools, sys, time
sys.path.insert(0, '/root/repo')
from tpuhuff.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bench import make_textlike
from tpuhuff.kernels.pallas_histogram import _hist_call, _finalize, ROWS, CELL_BYTES

n = 100 << 20
data = make_textlike(n)
ref = np.bincount(data, minlength=256)
j2d = jax.device_put(jnp.asarray(data.reshape(-1, 256)))
j2d.block_until_ready()

def kslope(make, arg, label, K1=2, K2=16, REPS=4):
    times = {}
    for K in (K1, K2):
        f = make(K)
        t0 = time.time(); int(f(arg)); print(f"  {label} K={K}: compile {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter(); int(f(arg)); best = min(best, time.perf_counter()-t0)
        times[K] = best
    return (times[K2]-times[K1])/(K2-K1)

# ---- V2: 3D bitcast ----
def hist_v2(x2d):
    flat3 = x2d.reshape(-1, 128, 4)
    words = jax.lax.bitcast_convert_type(flat3, jnp.uint32)  # (m,128)
    return _finalize(_hist_call(words))

# ---- V3: u8-input kernel ----
URows = ROWS * 4  # 1024 u8 rows of 128 = 128KiB per cell

def _hist_kernel_u8(w_ref, o_ref, accf_ref, acci_ref):
    i = pl.program_id(0)
    np_ = pl.num_programs(0)
    @pl.when(i == 0)
    def _():
        accf_ref[:] = jnp.zeros_like(accf_ref)
        acci_ref[:] = jnp.zeros_like(acci_ref)
    T = ROWS * 8
    sub = jax.lax.broadcasted_iota(jnp.int32, (256, T), 0)
    binv = sub >> 4
    for q in range(4):
        p = w_ref[256 * q : 256 * (q + 1), :].astype(jnp.int32)
        s16 = jnp.concatenate(
            [p[16 * k : 16 * (k + 1)] for k in range(16)], axis=1)
        r = jnp.concatenate([s16] * 16, axis=0)
        a = ((r >> 4) == binv).astype(jnp.bfloat16)
        b = ((r & 15) == binv).astype(jnp.bfloat16)
        accf_ref[:] += jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    @pl.when(jnp.logical_or(i % 64 == 63, i == np_ - 1))
    def _():
        acci_ref[:] += accf_ref[:].astype(jnp.int32)
        accf_ref[:] = jnp.zeros_like(accf_ref)
    @pl.when(i == np_ - 1)
    def _():
        o_ref[:] = acci_ref[:]

@jax.jit
def hist_v3(x2d):
    b2 = x2d.reshape(-1, 128)  # (n/128, 128) u8
    cells = b2.shape[0] // URows
    C = pl.pallas_call(
        _hist_kernel_u8,
        grid=(cells,),
        in_specs=[pl.BlockSpec((URows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
        scratch_shapes=[pltpu.VMEM((256, 256), jnp.float32),
                        pltpu.VMEM((256, 256), jnp.int32)],
    )(b2)
    return _finalize(C)

for label, fn in (("V2 3d-bitcast", hist_v2), ("V3 u8-kernel", hist_v3)):
    try:
        got = np.asarray(fn(j2d))
        print(f"{label}: correct={np.array_equal(got, ref)}", flush=True)
        def make(K, fn=fn):
            @jax.jit
            def run(b):
                def body(i, acc):
                    h = fn(jnp.roll(b, i, axis=0))
                    return acc + (h[3 + i % 2] & 0xFFFF)
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        per = kslope(make, j2d, label)
        print(f"{label}: {per*1e3:.2f} ms -> {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"{label}: {type(e).__name__}: {str(e)[:300]}", flush=True)

"""r3 s6: (a) roll vs xor variation cost at 100MiB; (b) int8 dot in the
u8 hist kernel; (c) encode with xor variation."""
import functools, sys, time
sys.path.insert(0, '/root/repo')
from tpuhuff.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bench import make_textlike

n = 100 << 20
data = make_textlike(n)
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

# (a) variation-only cost: consume one element of the varied array via a
# tiny pallas passthrough? simpler: sum a small slice (forces materialize?)
# -> use jnp.sum of one 256-row slab (reads varied buffer; cheap)
for label, vary in (("roll", lambda b, i: jnp.roll(b, i, axis=0)),
                    ("xor", lambda b, i: b ^ (i & 255).astype(jnp.uint8))):
    def make(K, vary=vary):
        @jax.jit
        def run(b):
            def body(i, acc):
                v = vary(b, i)
                return acc + jnp.sum(v[5:6].astype(jnp.int32)) + jnp.sum(v[-2:-1].astype(jnp.int32))
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run
    per = kslope(make, j2d, f"vary[{label}]")
    print(f"vary[{label}]: {per*1e3:.2f} ms", flush=True)

# (b) int8 dot hist kernel
from tpuhuff.kernels.pallas_histogram import _finalize, ROWS
URows = ROWS * 4

def mk_u8_kernel(i8: bool):
    def kern(w_ref, o_ref, accf_ref, acci_ref):
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
            s16 = jnp.concatenate([p[16*k:16*(k+1)] for k in range(16)], axis=1)
            r = jnp.concatenate([s16] * 16, axis=0)
            if i8:
                a = ((r >> 4) == binv).astype(jnp.int8)
                b = ((r & 15) == binv).astype(jnp.int8)
                accf_ref[:] += jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            else:
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
    return kern

def mk_hist(i8):
    kern = mk_u8_kernel(i8)
    @jax.jit
    def hist(x2d):
        b2 = x2d.reshape(-1, 128)
        cells = b2.shape[0] // URows
        C = pl.pallas_call(
            kern, grid=(cells,),
            in_specs=[pl.BlockSpec((URows, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, 256), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
            scratch_shapes=[pltpu.VMEM((256, 256), jnp.float32),
                            pltpu.VMEM((256, 256), jnp.int32)],
        )(b2)
        return _finalize(C)
    return hist

ref = np.bincount(data, minlength=256)
for label, i8 in (("hist-u8-i8dot", True),):
    try:
        fn = mk_hist(i8)
        got = np.asarray(fn(j2d))
        print(f"{label}: correct={np.array_equal(got, ref)}", flush=True)
        def make(K, fn=fn):
            @jax.jit
            def run(b):
                def body(i, acc):
                    h = fn(b ^ (i & 255).astype(jnp.uint8))
                    return acc + (h[3 + i % 2] & 0xFFFF)
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        per = kslope(make, j2d, label)
        print(f"{label}: {per*1e3:.2f} ms -> {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"{label}: {type(e).__name__}: {str(e)[:200]}", flush=True)

# (c) encode with xor variation at 100MiB
from tpuhuff.core.canonical import canonicalize
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels.encode import make_canonical_encode_tables, make_encode_tables, encode_blocks
tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
lens_lut, codes_lut = tree.encode_tables()
dl, da = make_encode_tables(lens_lut, codes_lut)
canon = make_canonical_encode_tables(tree)
ML = int(np.asarray(lens_lut).max())
def make(K):
    @jax.jit
    def run(b):
        def body(i, acc):
            v = b ^ (i & 255).astype(jnp.uint8)
            words, bits = encode_blocks(v, dl, da, max_code_len=ML,
                                        canon_tables=canon[:4],
                                        full_alphabet=bool(canon[5]))
            return acc + (jnp.sum(bits).astype(jnp.int32) & 0xFFFF)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))
    return run
per = kslope(make, j2d, "enc-xor")
print(f"enc-xor 100MiB: {per*1e3:.2f} ms -> {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)

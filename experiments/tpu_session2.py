"""TPU session 2: bisect the pallas compile crash + honest xla-enc number."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(f"[{time.strftime('%H:%M:%S')}] waiting for device...", flush=True)
t0 = time.time()
_ = float((jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum())
print(f"[{time.strftime('%H:%M:%S')}] device up after {time.time()-t0:.0f}s", flush=True)

rng = np.random.default_rng(0)
L = 128

def try_kernel(name, kernel, out_shapes, in_arrays, grid=None, in_specs=None, out_specs=None):
    kw = {}
    if grid is not None:
        kw["grid"] = grid
        kw["in_specs"] = in_specs
        kw["out_specs"] = out_specs
    else:
        kw["in_specs"] = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(in_arrays)
        kw["out_specs"] = (
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shapes)
            if isinstance(out_shapes, list) else pl.BlockSpec(memory_space=pltpu.VMEM)
        )
    try:
        f = jax.jit(lambda *a: pl.pallas_call(kernel, out_shape=out_shapes, **kw)(*a))
        r = f(*in_arrays)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        # force completion
        first = jax.tree_util.tree_leaves(r)[0]
        _ = np.asarray(first).ravel()[0]
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)
        return False

N = 64
ac = jnp.asarray(rng.integers(0, 2**31, (N, L), dtype=np.uint32))
ln = jnp.asarray(rng.integers(1, 12, (N, L), dtype=np.int32))

# A: iota only
def kA(a_ref, o_ref):
    row = jax.lax.broadcasted_iota(jnp.int32, (N, L), 0)
    o_ref[:] = a_ref[:] + row.astype(jnp.uint32)
try_kernel("A-iota", kA, jax.ShapeDtypeStruct((N, L), jnp.uint32), [ac])

# B: concatenate-based roll
def kB(a_ref, o_ref):
    x = a_ref[:]
    pad = jnp.zeros((4, L), x.dtype)
    o_ref[:] = jnp.concatenate([x[4:], pad], axis=0)
try_kernel("B-concat-roll", kB, jax.ShapeDtypeStruct((N, L), jnp.uint32), [ac])

# C: (1, L) output
def kC(a_ref, o_ref, b_ref):
    o_ref[:] = a_ref[:]
    b_ref[:] = a_ref[0:1]
try_kernel("C-1xL-out", kC,
           [jax.ShapeDtypeStruct((N, L), jnp.uint32), jax.ShapeDtypeStruct((1, L), jnp.uint32)],
           [ac])

# D: one merge level (exact kernel code, 1 level)
sys.path.insert(0, "/root/repo")
from tpuhuff.kernels.pallas_encode import merge_pack_kernel
def kD(a_ref, l_ref, w_ref, b_ref):
    merge_pack_kernel(a_ref, l_ref, w_ref, b_ref)
try_kernel("D-full-64", kD,
           [jax.ShapeDtypeStruct((N, L), jnp.uint32), jax.ShapeDtypeStruct((1, L), jnp.int32)],
           [ac, ln])

# E: full kernel at N=2048
N2 = 2048
ac2 = jnp.asarray(rng.integers(0, 2**31, (N2, L), dtype=np.uint32))
ln2 = jnp.asarray(rng.integers(1, 12, (N2, L), dtype=np.int32))
try_kernel("E-full-2048", kD,
           [jax.ShapeDtypeStruct((N2, L), jnp.uint32), jax.ShapeDtypeStruct((1, L), jnp.int32)],
           [ac2, ln2])

# F: with grid over lanes
try_kernel("F-full-grid", kD,
           [jax.ShapeDtypeStruct((N, 2*L), jnp.uint32), jax.ShapeDtypeStruct((1, 2*L), jnp.int32)],
           [jnp.asarray(rng.integers(0, 2**31, (N, 2*L), dtype=np.uint32)),
            jnp.asarray(rng.integers(1, 12, (N, 2*L), dtype=np.int32))],
           grid=(2,),
           in_specs=[pl.BlockSpec((N, L), lambda i: (0, i), memory_space=pltpu.VMEM)]*2,
           out_specs=[pl.BlockSpec((N, L), lambda i: (0, i), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, L), lambda i: (0, i), memory_space=pltpu.VMEM)])

# G: honest xla-enc with words consumed
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels.encode import encode_blocks, make_encode_tables
MB = 16; n = MB << 20
data = rng.integers(0, 64, n, dtype=np.uint8)
tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
dl, da = make_encode_tables(*tree.encode_tables())
blocks = jnp.asarray(data.reshape(n // 2048, 2048))

def amortized(name, one_iter, K1=1, K2=3):
    def make(K):
        @jax.jit
        def run(b):
            return jax.lax.fori_loop(0, K, lambda i, a: a + one_iter(b, i), jnp.int32(0))
        return run
    rs = {}
    for K in (K1, K2):
        f = make(K)
        int(f(blocks))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); int(f(blocks)); best = min(best, time.perf_counter()-t0)
        rs[K] = best
    per = (rs[K2]-rs[K1])/(K2-K1)
    print(f"{name}: {per*1e3:.2f}ms/iter = {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)

def enc_real(b, i):
    w, bits = encode_blocks(jnp.roll(b, i, axis=0), dl, da)
    return (jnp.sum(bits) + jnp.sum(w[:, -1].astype(jnp.int32)) + w[0, 0].astype(jnp.int32)) & 0xFFFF
amortized("xla-enc-real", enc_real)

def merge_real(b, i):
    # merge only: synthetic lens/acodes (no LUT) — measures the pack alone
    del b
    lens_r = ((jnp.arange(n // 2048 * 2048, dtype=jnp.int32).reshape(n // 2048, 2048) + i) % 11 + 1)
    acodes_r = (lens_r * 77773).astype(jnp.uint32) << 20
    w, bits = encode_blocks.__wrapped__(None, None, None) if False else encode_blocks
    from tpuhuff.kernels.encode import _merge_level
    vals = acodes_r[..., None]; cur = lens_r
    while vals.shape[-2] > 1:
        vals, cur = _merge_level(vals, cur)
    return (jnp.sum(cur) + vals[0, 0, 0].astype(jnp.int32)) & 0xFFFF
amortized("xla-merge-real", merge_real)
print("ALL DONE", flush=True)

"""TPU session 3: gather-free select-tree LUT timings + pallas bisect.

Order matters: honest timing measurements FIRST (safe), pallas compile
attempts LAST (a remote-compile crash can wedge the relay).
Methodology: K-iteration fori_loop slope (see PERF_NOTES.md).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def ts():
    return time.strftime('%H:%M:%S')

print(f"[{ts()}] waiting for device...", flush=True)
t0 = time.time()
_ = float((jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum())
print(f"[{ts()}] device up after {time.time()-t0:.0f}s: {jax.devices()[0]}", flush=True)

from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels.encode import (
    encode_blocks, make_encode_tables, lut_select, lut_lens, _merge_level,
)

rng = np.random.default_rng(0)
MB = 16
n = MB << 20
data = rng.integers(0, 64, n, dtype=np.uint8)
tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
dl, da = make_encode_tables(*tree.encode_tables())
BL = 2048
B = n // BL
print(f"[{ts()}] uploading {MB} MiB as {B}x{BL}...", flush=True)
t0 = time.time()
blocks = jax.device_put(jnp.asarray(data.reshape(B, BL)))
_ = int(jnp.sum(blocks[0].astype(jnp.int32)))
print(f"[{ts()}] upload done in {time.time()-t0:.0f}s", flush=True)


def amortized(name, one_iter, K1=1, K2=5):
    try:
        def make(K):
            @jax.jit
            def run(b):
                return jax.lax.fori_loop(0, K, lambda i, a: a + one_iter(b, i), jnp.int32(0))
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


# 1. select-tree LUT alone (256-entry u32)
def sel_only(b, i):
    v = lut_select(jnp.roll(b, i, axis=0).astype(jnp.int32), da)
    return (jnp.sum(v & 1) & 0xFFFF).astype(jnp.int32)
amortized("sel-lut   ", sel_only)

# 2. packed lens LUT alone (64-entry tree + shift)
def lens_only(b, i):
    v = lut_lens(jnp.roll(b, i, axis=0).astype(jnp.int32), dl)
    return (jnp.sum(v) & 0xFFFF).astype(jnp.int32)
amortized("lens-lut  ", lens_only)

# 3. full encode, gather-free
def enc_gf(b, i):
    w, bits = encode_blocks(jnp.roll(b, i, axis=0), dl, da, gather_free=True)
    return ((jnp.sum(bits) + jnp.sum(w[:, -1].astype(jnp.int32))) & 0xFFFF).astype(jnp.int32)
amortized("enc-gf    ", enc_gf, K1=1, K2=3)

# 4. merge only (synthetic lens/acodes, no LUT)
def merge_only(b, i):
    lens_r = ((jnp.arange(B * BL, dtype=jnp.int32).reshape(B, BL) + i) % 11 + 1)
    acodes_r = (lens_r * 77773).astype(jnp.uint32) << 20
    vals = acodes_r[..., None]
    cur = lens_r
    while vals.shape[-2] > 1:
        vals, cur = _merge_level(vals, cur)
    return ((jnp.sum(cur) + vals[0, 0, 0].astype(jnp.int32)) & 0xFFFF).astype(jnp.int32)
amortized("merge-only", merge_only, K1=1, K2=3)

# 5. correctness probe on device: one block vs host packer
from tpuhuff.core.codec import pack_codes_u8
from tpuhuff.kernels.encode import words_to_payload
w, bits = encode_blocks(blocks[:8], dl, da, gather_free=True)
lens_t, codes_t = tree.encode_tables()
ref, _ = pack_codes_u8(np.asarray(blocks[0]), lens_t, codes_t)
got = words_to_payload(np.asarray(w[0]), int(bits[0]))
print(f"device gf bit-exact vs host: {'OK' if got == ref else 'MISMATCH'}", flush=True)

# ---- pallas bisect LAST ----
print(f"[{ts()}] starting pallas bisect (risky)", flush=True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128
def try_kernel(name, kernel, out_shapes, in_arrays):
    try:
        f = jax.jit(lambda *a: pl.pallas_call(
            kernel, out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(in_arrays),
            out_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shapes)
                       if isinstance(out_shapes, list) else pl.BlockSpec(memory_space=pltpu.VMEM)),
        )(*a))
        r = f(*in_arrays)
        first = jax.tree_util.tree_leaves(r)[0]
        _ = np.asarray(first).ravel()[0]
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:150]}", flush=True)
        return False

N = 64
ac = jnp.asarray(rng.integers(0, 2**31, (N, L), dtype=np.uint32))
ln = jnp.asarray(rng.integers(1, 12, (N, L), dtype=np.int32))

def kA(a_ref, o_ref):
    row = jax.lax.broadcasted_iota(jnp.int32, (N, L), 0)
    o_ref[:] = a_ref[:] + row.astype(jnp.uint32)
ok = try_kernel("A-iota", kA, jax.ShapeDtypeStruct((N, L), jnp.uint32), [ac])

def kB(a_ref, o_ref):
    x = a_ref[:]
    pad = jnp.zeros((4, L), x.dtype)
    o_ref[:] = jnp.concatenate([x[4:], pad], axis=0)
if ok:
    ok = try_kernel("B-concat-roll", kB, jax.ShapeDtypeStruct((N, L), jnp.uint32), [ac])

def kC(a_ref, o_ref, b_ref):
    o_ref[:] = a_ref[:]
    b_ref[:] = a_ref[0:1]
if ok:
    ok = try_kernel("C-1xL-out", kC,
                    [jax.ShapeDtypeStruct((N, L), jnp.uint32),
                     jax.ShapeDtypeStruct((1, L), jnp.uint32)], [ac])

def kD_var(a_ref, l_ref, o_ref):
    # variable per-element shift — suspect for the mosaic crash
    x = a_ref[:]
    r = (l_ref[:] & 31).astype(jnp.uint32)
    o_ref[:] = (x << r) | jnp.where(r == 0, jnp.uint32(0), x >> ((jnp.uint32(32) - r) & 31))
if ok:
    ok = try_kernel("D-varshift", kD_var, jax.ShapeDtypeStruct((N, L), jnp.uint32), [ac, ln])

def kE_where_roll(a_ref, l_ref, o_ref):
    x = a_ref[:]
    q = (l_ref[:] >> 5) & 1
    pad = jnp.zeros((1, L), x.dtype)
    rolled = jnp.concatenate([x[1:], pad], axis=0)
    o_ref[:] = jnp.where(q == 1, rolled, x)
if ok:
    ok = try_kernel("E-where-roll", kE_where_roll, jax.ShapeDtypeStruct((N, L), jnp.uint32), [ac, ln])

from tpuhuff.kernels.pallas_encode import merge_pack_kernel
def kF(a_ref, l_ref, w_ref, b_ref):
    merge_pack_kernel(a_ref, l_ref, w_ref, b_ref)
if ok:
    try_kernel("F-full-64", kF,
               [jax.ShapeDtypeStruct((N, L), jnp.uint32),
                jax.ShapeDtypeStruct((1, L), jnp.int32)], [ac, ln])

print("ALL DONE", flush=True)

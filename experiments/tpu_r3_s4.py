"""Round-3 session 4: fix the hist kernel's operand-layout cliff + perm-dot.

s3 findings: one-hot chain 57 GB/s, iota-operand dots 22 GB/s, but the
combined kernel 2.4 GB/s -> the repeat() output feeding the MXU forces a
pathological relayout.  Variants here:
  H1: stage a/b one-hots through VMEM scratch before the dot
  H2: chunk the dot K into 512-lane slices (4 dots per plane)
  H3: concat-of-copies instead of pltpu.repeat
  D:  perm-matmul byte-plane extraction with PI as real inputs

Run: python experiments/tpu_r3_s4.py [h1|h2|h3|d|all]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpuhuff.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K1, K2, REPS = 2, 16, 4
ROWS = 256


def log(*a):
    print(*a, flush=True)


def kslope(make, arg, label):
    times = {}
    for K in (K1, K2):
        f = make(K)
        t0 = time.time()
        int(f(arg))
        log(f"  {label} K={K}: compile+first {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            int(f(arg))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[K2] - times[K1]) / (K2 - K1)


def _mk_hist_kernel(variant: str):
    T = ROWS * 8

    def kern(w_ref, o_ref, acc_ref, a_s, b_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = w_ref[:]
        sub = jax.lax.broadcasted_iota(jnp.int32, (256, T), 0)
        binv = sub >> 4
        for shift in (0, 8, 16, 24):
            p = ((w >> shift) & 0xFF).astype(jnp.int32)
            s16 = jnp.concatenate(
                [p[16 * k : 16 * (k + 1)] for k in range(ROWS // 16)],
                axis=1)  # (16, T)
            if variant == "h3":
                r = jnp.concatenate([s16] * 16, axis=0)
            else:
                r = pltpu.repeat(s16, 16, axis=0)  # (256, T) tile-repeat
            a = ((r >> 4) == binv).astype(jnp.bfloat16)
            b = ((r & 15) == binv).astype(jnp.bfloat16)
            if variant == "h1":
                a_s[:] = a
                b_s[:] = b
                acc_ref[:] += jax.lax.dot_general(
                    a_s[:], b_s[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif variant == "h2":
                for c in range(4):
                    acc_ref[:] += jax.lax.dot_general(
                        a[:, c * 512 : (c + 1) * 512],
                        b[:, c * 512 : (c + 1) * 512],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
            else:
                acc_ref[:] += jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc_ref[:]

    return kern


def hist_call(words, variant):
    cells = words.shape[0] // ROWS
    T = ROWS * 8
    return pl.pallas_call(
        _mk_hist_kernel(variant),
        grid=(cells,),
        in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((256, 256), jnp.float32),
                        pltpu.VMEM((256, T), jnp.bfloat16),
                        pltpu.VMEM((256, T), jnp.bfloat16)],
    )(words)


def finalize(C):
    C = C.reshape(16, 16, 16, 16)  # rows 16k+g -> C[k,g,k',g'] at g==g'
    return jnp.einsum("kgjg->kj", C).reshape(256).astype(jnp.int32)


def probe_h(words, data_np, variant):
    ref = np.bincount(data_np, minlength=256)
    got = np.asarray(finalize(hist_call(words, variant)))
    ok = np.array_equal(got, ref)
    log(f"H[{variant}]: correct={ok}")
    if not ok:
        return

    def make(K):
        @jax.jit
        def run(w):
            def body(i, acc):
                h = finalize(hist_call(jnp.roll(w, i, axis=0), variant))
                return acc + (h[3] & 0xFFFF)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    per = kslope(make, words, f"H[{variant}]")
    nbytes = words.shape[0] * 128 * 4
    log(f"H[{variant}]: {per*1e3:.2f} ms -> "
        f"{nbytes / max(per, 1e-9) / 1e9:.2f} GB/s")


def _perm_halves(dtype):
    r = np.arange(128)
    src = (r >> 1) + 64 * (r & 1)
    pi = np.zeros((128, 128), np.float32)
    pi[r, src] = 1.0
    return (jnp.asarray(pi[:, :64], dtype), jnp.asarray(pi[:, 64:], dtype))


def probe_d(words):
    def kern(w_ref, pa_ref, pb_ref, o0_ref, o1_ref):
        w = w_ref[:]
        u0 = (w & 0xFF).astype(jnp.int32).astype(pa_ref.dtype)
        u1 = ((w >> 8) & 0xFF).astype(jnp.int32).astype(pa_ref.dtype)
        u2 = ((w >> 16) & 0xFF).astype(jnp.int32).astype(pa_ref.dtype)
        u3 = (w >> 24).astype(jnp.int32).astype(pa_ref.dtype)
        nt = (((1,), (1,)), ((), ()))
        b0 = (jax.lax.dot_general(pa_ref[:], u0, nt,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(pb_ref[:], u2, nt,
                                    preferred_element_type=jnp.float32))
        b1 = (jax.lax.dot_general(pa_ref[:], u1, nt,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(pb_ref[:], u3, nt,
                                    preferred_element_type=jnp.float32))
        o0_ref[:] = b0.astype(jnp.int32)
        o1_ref[:] = b1.astype(jnp.int32)

    def host_ref(w_np):
        t = w_np.T
        out0 = np.zeros((128, 128), np.int32)
        out1 = np.zeros((128, 128), np.int32)
        out0[0::2] = t & 0xFF
        out1[0::2] = (t >> 8) & 0xFF
        out0[1::2] = (t >> 16) & 0xFF
        out1[1::2] = t >> 24
        return out0, out1

    w0 = np.asarray(words[:128, :64], dtype=np.uint32)
    r0, r1 = host_ref(w0)
    for name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        pa, pb = _perm_halves(dtype)
        cells_all = words.shape[0] // 128

        def call(w, cells):
            return pl.pallas_call(
                kern,
                grid=(cells,),
                in_specs=[
                    pl.BlockSpec((128, 64), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, 64), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, 64), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=[
                    pl.BlockSpec((128, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)],
                out_shape=[
                    jax.ShapeDtypeStruct((cells * 128, 128), jnp.int32),
                    jax.ShapeDtypeStruct((cells * 128, 128), jnp.int32)],
            )(w, pa, pb)

        try:
            o0, o1 = call(jnp.asarray(w0), 1)
            ok = (np.array_equal(np.asarray(o0), r0)
                  and np.array_equal(np.asarray(o1), r1))
            log(f"D[perm-dot {name}]: correct={ok}")
            if not ok:
                continue
        except Exception as e:
            log(f"D[perm-dot {name}]: {type(e).__name__}: {str(e)[:200]}")
            continue

        def make(K):
            @jax.jit
            def run(w):
                def body(i, acc):
                    o0, o1 = call(jnp.roll(w[:, :64], i, axis=0), cells_all)
                    return acc + o0[0, 0] + o1[-1, -1]
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run

        per = kslope(make, words, f"D[perm-dot {name}]")
        nbytes = cells_all * 128 * 64 * 4
        log(f"D[perm-dot {name}]: {per*1e3:.2f} ms -> "
            f"{nbytes / max(per, 1e-9) / 1e9:.2f} GB/s-of-bytes")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(f"device: {jax.devices()[0]} ({jax.default_backend()})")
    rng = np.random.default_rng(0)
    n = 16 << 20
    data_np = rng.integers(0, 256, n, dtype=np.uint8)
    words = jax.device_put(jnp.asarray(
        data_np.view("<u4").reshape(-1, 128)))
    words.block_until_ready()
    if which in ("d", "all"):
        probe_d(words)
    for v in ("h1", "h2", "h3"):
        if which in (v, "all"):
            probe_h(words, data_np, v)


if __name__ == "__main__":
    main()

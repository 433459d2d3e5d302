"""Round-3 session 3: Mosaic micro-probes.

A. dot-only rate: (256,2048)bf16 x (256,2048)bf16 NT dot -> (256,256) f32,
   4 per grid step (the hist kernel's MXU work), constant operands.
B. same, TN form: (256,2048) @ (2048,256).
C. one-hot construction only (no dot): the hist kernel's VPU chain.
D. in-kernel transpose+interleave: (128,64)u32 tile -> (128,128)i32 pairs
   (the encode kernel's input fusion) — correctness + rate.

Run:  python experiments/tpu_r3_s3_micro.py [a|b|c|d|all]
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
ROWS = 256  # u32 rows per cell (128 KiB of bytes)


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


def run_cells(kern_body, words, n_scratch_f32=True, label="x"):
    cells = words.shape[0] // ROWS

    def make(K):
        @jax.jit
        def run(w):
            def body(i, acc):
                out = pl.pallas_call(
                    kern_body,
                    grid=(cells,),
                    in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((256, 256), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((256, 256), jnp.float32)],
                )(jnp.roll(w, i, axis=0))
                return acc + out[0, 0].astype(jnp.int32)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    per = kslope(make, words, label)
    nbytes = words.shape[0] * 128 * 4
    gbps = nbytes / max(per, 1e-9) / 1e9
    log(f"{label}: {per*1e3:.2f} ms -> {gbps:.2f} GB/s-of-bytes")
    return gbps


def _init_acc(acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)


def _fin(o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def probe_a(words):
    """cmp+cast+dot only: one-hots built straight from iota + one data
    scalar (no unpack/concat/repeat) — isolates the dot + operand cast."""
    def kern(w_ref, o_ref, acc_ref):
        _init_acc(acc_ref)
        T = ROWS * 8
        sub = jax.lax.broadcasted_iota(jnp.int32, (256, T), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (256, T), 1)
        s = (w_ref[0:1, 0:1] & 15).astype(jnp.int32)
        for k in range(4):
            a = ((sub >> 4) == ((lane + k) & 15) + s - s).astype(jnp.bfloat16)
            b = ((sub & 15) == ((lane + k + 1) & 15)).astype(jnp.bfloat16)
            acc_ref[:] += jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        _fin(o_ref, acc_ref)

    run_cells(kern, words, label="A cmp+dotNT x4")


def probe_b(words):
    """dot in TN form (contract a-lanes with b-sublanes)."""
    def kern(w_ref, o_ref, acc_ref):
        _init_acc(acc_ref)
        T = ROWS * 8
        sub = jax.lax.broadcasted_iota(jnp.int32, (256, T), 0)
        subT = jax.lax.broadcasted_iota(jnp.int32, (T, 256), 0)
        laneT = jax.lax.broadcasted_iota(jnp.int32, (T, 256), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (256, T), 1)
        s = (w_ref[0:1, 0:1] & 15).astype(jnp.int32)
        for k in range(4):
            a = ((sub >> 4) == ((lane + k) & 15) + s - s).astype(jnp.bfloat16)
            bt = ((laneT & 15) == ((subT + k + 1) & 15)).astype(jnp.bfloat16)
            acc_ref[:] += jax.lax.dot_general(
                a, bt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        _fin(o_ref, acc_ref)

    run_cells(kern, words, label="B cmp+dotTN x4")


def probe_c(words):
    def kern(w_ref, o_ref, acc_ref):
        _init_acc(acc_ref)
        w = w_ref[:]
        T = ROWS * 8
        sub = jax.lax.broadcasted_iota(jnp.int32, (256, T), 0)
        binv = sub >> 4
        tot = jnp.zeros((256, 1), jnp.float32)
        for shift in (0, 8, 16, 24):
            p = ((w >> shift) & 0xFF).astype(jnp.int32)
            s16 = jnp.concatenate(
                [p[16 * k : 16 * (k + 1)] for k in range(ROWS // 16)], axis=1)
            r = pltpu.repeat(s16, 16, axis=0)
            a = ((r >> 4) == binv).astype(jnp.bfloat16)
            b = ((r & 15) == binv).astype(jnp.bfloat16)
            tot = tot + (jnp.sum(a, axis=1, keepdims=True)
                         + jnp.sum(b, axis=1, keepdims=True)).astype(
                             jnp.float32)
        acc_ref[:] += tot
        _fin(o_ref, acc_ref)

    run_cells(kern, words, label="C onehot-only")


def _perm_halves():
    """PI = 128x128 perfect-shuffle permutation split into two 128x64
    halves: out[2w] = first_half[w], out[2w+1] = second_half[w].
    PI[r, src(r)] = 1 with src(r) = (r>>1) + 64*(r&1)."""
    r = np.arange(128)
    src = (r >> 1) + 64 * (r & 1)
    pi = np.zeros((128, 128), np.float32)
    pi[r, src] = 1.0
    return pi[:, :64], pi[:, 64:]


def probe_d(words):
    """Encode input fusion: natural (128,64)u32 tile -> the two byte planes
    of the packed-pair layout, via 4 constant-permutation NT matmuls —
    no XLA layout pass, no in-kernel transpose, no gather."""
    pa, pb = _perm_halves()

    def mk_kern(dtype):
        def kern(w_ref, o0_ref, o1_ref):
            w = w_ref[:]  # (128, 64) u32: row = block lane, lane = word idx
            u0 = (w & 0xFF).astype(jnp.int32).astype(dtype)   # byte 0
            u1 = ((w >> 8) & 0xFF).astype(jnp.int32).astype(dtype)
            u2 = ((w >> 16) & 0xFF).astype(jnp.int32).astype(dtype)
            u3 = (w >> 24).astype(jnp.int32).astype(dtype)
            ja = jnp.asarray(pa, dtype)
            jb = jnp.asarray(pb, dtype)
            nt = (((1,), (1,)), ((), ()))
            # byte0 of pair row 2w = u0[:,w]; of row 2w+1 = u2[:,w]
            b0 = (jax.lax.dot_general(ja, u0, nt,
                                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(jb, u2, nt,
                                        preferred_element_type=jnp.float32))
            b1 = (jax.lax.dot_general(ja, u1, nt,
                                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(jb, u3, nt,
                                        preferred_element_type=jnp.float32))
            o0_ref[:] = b0.astype(jnp.int32)
            o1_ref[:] = b1.astype(jnp.int32)
        return kern

    def host_ref(w_np):
        # pairs (128,128): row p, lane l = bytes (2p, 2p+1) of block l
        t = w_np.T  # (64,128) words
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
        try:
            o0, o1 = pl.pallas_call(
                mk_kern(dtype),
                out_shape=[jax.ShapeDtypeStruct((128, 128), jnp.int32),
                           jax.ShapeDtypeStruct((128, 128), jnp.int32)],
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                           pl.BlockSpec(memory_space=pltpu.VMEM)],
            )(jnp.asarray(w0))
            ok = (np.array_equal(np.asarray(o0), r0)
                  and np.array_equal(np.asarray(o1), r1))
            log(f"D[perm-dot {name}]: compiles, correct={ok}")
            if not ok:
                continue
        except Exception as e:
            log(f"D[perm-dot {name}]: {type(e).__name__}: {str(e)[:200]}")
            continue

        cells = words.shape[0] // 128
        kern = mk_kern(dtype)

        def make(K):
            @jax.jit
            def run(w):
                def body(i, acc):
                    o0, o1 = pl.pallas_call(
                        kern,
                        grid=(cells,),
                        in_specs=[pl.BlockSpec(
                            (128, 64), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)],
                        out_specs=[
                            pl.BlockSpec((128, 128), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((128, 128), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM)],
                        out_shape=[
                            jax.ShapeDtypeStruct((cells * 128, 128),
                                                 jnp.int32),
                            jax.ShapeDtypeStruct((cells * 128, 128),
                                                 jnp.int32)],
                    )(jnp.roll(w[:, :64], i, axis=0))
                    return acc + o0[0, 0] + o1[-1, -1]
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run

        per = kslope(make, words, f"D[perm-dot {name}]")
        nbytes = cells * 128 * 64 * 4
        log(f"D[perm-dot {name}]: {per*1e3:.2f} ms -> "
            f"{nbytes / max(per, 1e-9) / 1e9:.2f} GB/s-of-bytes")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(f"device: {jax.devices()[0]} ({jax.default_backend()})")
    rng = np.random.default_rng(0)
    n = 16 << 20
    words = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, n // 4, dtype=np.uint32).reshape(-1, 128)))
    words.block_until_ready()
    if which in ("d", "all"):
        probe_d(words)
    if which in ("c", "all"):
        probe_c(words)
    if which in ("a", "all"):
        probe_a(words)
    if which in ("b", "all"):
        probe_b(words)


if __name__ == "__main__":
    main()

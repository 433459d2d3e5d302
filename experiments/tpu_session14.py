"""TPU session 14: v3 encoder — in-kernel 4-byte unpack via pltpu.repeat.

v2 (session 13) needs an XLA prep pass (pair-pack + transpose) costing
~0.5 ms of the 2.2 ms e2e at N=256.  v3 feeds the kernel the raw little-
endian u32 view (N/4 rows, 1 byte/sym of HBM traffic), unpacks 4 bytes
in-kernel, forms both pair words, and interleaves them to the (N/2, LANES)
merge layout with pltpu.repeat + parity select.  Also: histogram-only cost,
pltpu.roll vs concat-roll, and an N sweep {128, 256, 512}.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def ts():
    return time.strftime('%H:%M:%S')

print(f"[{ts()}] waiting for device...", flush=True)
t0 = time.time()
_ = float((jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum())
print(f"[{ts()}] device up after {time.time()-t0:.0f}s", flush=True)

from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.core.canonical import canonicalize
from tpuhuff.kernels.encode import (
    encode_blocks, make_encode_tables, make_canonical_encode_tables,
)
from tpuhuff.kernels.pallas_encode2 import (
    _ladder, _roll_up_masked, _roll_up, _roll_down, LANES,
)
from tpuhuff.kernels.histogram import histogram

rng = np.random.default_rng(0)
n = 16 << 20
text = (
    b"the of and to in a is that it was for on are as with his they at "
    b"<page><title>Benchmark</title><revision><text xml:space=\"preserve\">"
    b"In information theory, a Huffman code is a particular type of optimal "
    b"prefix code that is commonly used for lossless data compression. "
)
data = np.frombuffer(text * (n // len(text) + 1), dtype=np.uint8)[:n].copy()
idx = rng.integers(0, n, n // 64)
data[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)
tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
lens_t, codes_t = tree.encode_tables()
ML = int(lens_t.max())
dl, da = make_encode_tables(lens_t, codes_t)
ct = make_canonical_encode_tables(tree)[:4]
print(f"[{ts()}] tree ML={ML}", flush=True)

inv4 = jnp.asarray(np.asarray(ct[0], np.uint32).reshape(1, 64))
pres = jnp.asarray(np.asarray(ct[1], np.uint32).reshape(1, 8))
cumle32 = np.zeros((1, 32), np.int32)
cumle32[0, : np.asarray(ct[2]).size] = np.asarray(ct[2])
dd32 = np.zeros((1, 32), np.int32)
dd32[0, : np.asarray(ct[3]).size] = np.asarray(ct[3])
cumle32, dd32 = jnp.asarray(cumle32), jnp.asarray(dd32)


def slope(mk, x0, label):
    tms = {}
    try:
        for K in (2, 16):
            f = mk(K)
            t0 = time.time()
            int(f(x0))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                int(f(x0))
                best = min(best, time.perf_counter() - t0)
            tms[K] = best
    except Exception as e:
        print(f"    {label} FAIL: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None
    per = (tms[16] - tms[2]) / 14
    print(f"  {label}: {per*1e3:.2f} ms/iter = {n/per/1e9:.2f} GB/s", flush=True)
    return per


# ---------- histogram-only cost ----------
B0 = n // 256
jb0 = jnp.asarray(data.reshape(B0, 256))
def mk_hist(K):
    @jax.jit
    def run(b):
        def body(i, acc):
            h = histogram(jnp.roll(b, i, axis=0))
            return acc + h[0]
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))
    return run
slope(mk_hist, jb0, "hist-only (N=256)")


# ---------- v3 kernel ----------
def _encode_kernel_v3(data_ref, valid_ref, inv4_ref, pres_ref, cumle_ref,
                      dd_ref, words_ref, bits_ref, *, N: int, ML: int,
                      use_ptpu_roll: bool):
    d4 = data_ref[:]  # (N/4, 128) int32: 4 LE bytes = syms 4r..4r+3
    rows4 = d4.shape[0]
    row4 = jax.lax.broadcasted_iota(jnp.int32, (rows4, LANES), 0)
    valid = valid_ref[:]
    xs, ls = [], []
    for j in range(4):
        b = (d4 >> (8 * j)) & 0xFF
        xj, lj = _ladder(b, 4 * row4 + j, valid, inv4_ref, pres_ref,
                         cumle_ref, dd_ref, ML)
        xs.append(xj)
        ls.append(lj)
    xA = xs[0] | (xs[1] >> ls[0].astype(jnp.uint32))
    lA = ls[0] + ls[1]
    xB = xs[2] | (xs[3] >> ls[2].astype(jnp.uint32))
    lB = ls[2] + ls[3]
    # interleave to (N/2, 128): even rows = xA, odd = xB
    rows = 2 * rows4
    rowv = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    even = (rowv & 1) == 0
    x = jnp.where(even, pltpu.repeat(xA, 2, 0), pltpu.repeat(xB, 2, 0))
    alen = jnp.where(even, pltpu.repeat(lA, 2, 0), pltpu.repeat(lB, 2, 0))
    W, gsyms = 1, 2

    def roll_up_masked(x_, s, group_rows):
        if use_ptpu_roll:
            rolled = pltpu.roll(x_, -s, 0)
            rr = jax.lax.broadcasted_iota(jnp.int32, x_.shape, 0)
            g = group_rows.bit_length() - 1
            same = ((rr + s) >> g) == (rr >> g)
            return jnp.where(same, rolled, jnp.zeros_like(rolled))
        return _roll_up_masked(x_, s, group_rows)

    while gsyms < N:
        rowv = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        is_b = ((rowv >> (W.bit_length() - 1)) & 1) == 1
        a_len = jnp.where(is_b, _roll_down(alen, W), alen)
        b_len = jnp.where(is_b, alen, _roll_up(alen, W))
        u = 32 * W - a_len
        frame = jnp.where(is_b, x, jnp.uint32(0))
        bA = min(ML * gsyms, 32 * W)
        qmin = (32 * W - bA) >> 5
        if qmin:
            frame = roll_up_masked(frame, qmin, 2 * W)
        qrem = (u >> 5) - qmin
        qrange = W - qmin
        bit = 0
        s = 1
        while s <= qrange:
            rolled = roll_up_masked(frame, s, 2 * W)
            frame = jnp.where(((qrem >> bit) & 1) == 1, rolled, frame)
            s *= 2
            bit += 1
        rb = (u & 31).astype(jnp.uint32)
        nxt = roll_up_masked(frame, 1, 2 * W)
        frame = jnp.where(
            rb == 0, frame,
            (frame << rb) | (nxt >> ((jnp.uint32(32) - rb) & 31)),
        )
        x = jnp.where(is_b, jnp.uint32(0), x) | frame
        alen = a_len + b_len
        W *= 2
        gsyms *= 2
    words_ref[:] = x
    bits_ref[:] = alen[0:1]


@functools.partial(jax.jit, static_argnames=("n_syms", "max_len", "uroll"))
def v3_call(data_t, valid_t, n_syms, max_len, uroll):
    rows4, B = data_t.shape
    N = n_syms
    kernel = functools.partial(_encode_kernel_v3, N=N, ML=max_len,
                               use_ptpu_roll=uroll)
    return pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[
            pl.BlockSpec((rows4, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N // 2, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N // 2, B), jnp.uint32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
    )(data_t, valid_t, inv4, pres, cumle32, dd32)


def run_v3(N, uroll):
    B = n // N
    blocks = data[: B * N].reshape(B, N)
    # u32 LE view, transposed to (N/4, B)
    d32 = blocks.view("<u4").astype(np.int32)  # (B, N/4)
    data_t = jnp.asarray(np.ascontiguousarray(d32.T))
    valid_t = jnp.full((1, B), N, jnp.int32)
    label = f"v3 N={N}" + (" pltpu.roll" if uroll else "")
    # parity on a small slice
    try:
        w, bl = v3_call(data_t[:, :256], valid_t[:, :256], N, ML, uroll)
        w, bl = np.asarray(w).T, np.asarray(bl)[0]
    except Exception as e:
        print(f"  {label} COMPILE FAIL: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    wr, br = encode_blocks(jnp.asarray(blocks[:256]), dl, da,
                           max_code_len=ML, canon_tables=ct, pallas=False)
    wr, br = np.asarray(wr), np.asarray(br)
    ok = np.array_equal(bl, br) and all(
        np.array_equal(w[i, : (bl[i] + 31) // 32], wr[i, : (br[i] + 31) // 32])
        for i in range(256))
    print(f"  [{ts()}] {label} parity={'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        return

    def mk(K):
        @jax.jit
        def run(x):
            def body(i, acc):
                wo, bo = v3_call(jnp.roll(x, i, axis=1), valid_t, N, ML, uroll)
                return acc + bo[0, 0] + bo[0, -1]
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run
    slope(mk, data_t, label + " kernel")

    # e2e: u32-view transpose prep in XLA from the natural (B, N/4) layout
    jd32 = jnp.asarray(d32)
    def mk_e2e(K):
        @jax.jit
        def run(x):
            def body(i, acc):
                xt = jnp.roll(x, i, axis=0).T
                wo, bo = v3_call(xt, valid_t, N, ML, uroll)
                return acc + bo[0, 0] + bo[0, -1]
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run
    slope(mk_e2e, jd32, label + " e2e+T")


run_v3(256, False)
run_v3(256, True)
run_v3(128, False)
run_v3(512, False)
print("ALL DONE", flush=True)

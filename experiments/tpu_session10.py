"""TPU session 10: Pallas VMEM canonical decoder on HW.

XLA canonical ladder reached 8.3 GB/s @ BL=128; the Pallas kernel removes
the per-step HBM buffer rewrite and op dispatch entirely.  Check compile at
production shape (cells ~128), correctness, and amortized throughput.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def ts():
    return time.strftime('%H:%M:%S')

print(f"[{ts()}] waiting for device...", flush=True)
t0 = time.time()
_ = float((jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum())
print(f"[{ts()}] device up after {time.time()-t0:.0f}s", flush=True)

from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.core.canonical import canonicalize
from tpuhuff.kernels.encode import encode_blocks, make_encode_tables
from tpuhuff.kernels.decode import make_canonical_decode_tables
from tpuhuff.kernels.pallas_decode import _decode_call, SUB, LANES

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
ub, dd, perm4, ml = make_canonical_decode_tables(tree)
print(f"[{ts()}] tree ML={ML}", flush=True)


def prep(BL):
    Bd = n // BL
    w, bl = encode_blocks(jnp.asarray(data.reshape(Bd, BL)), dl, da,
                          gather_free=True, max_code_len=ML, transposed=True)
    w = np.asarray(w); bl = np.asarray(bl).astype(np.int64)
    Wmax = int(((bl + 31) // 32).max()) + 1
    rows = np.zeros((Bd, Wmax), dtype=np.uint32)
    m = min(w.shape[1], Wmax)
    rows[:, :m] = w[:, :m]
    return rows, bl


def to_kernel_layout(rows, bl, S):
    B, W = rows.shape
    wpad = max(W, S + 1)
    rows_p = np.zeros((B, wpad), np.uint32)
    rows_p[:, :W] = rows
    cells = B // (SUB * LANES)
    rows_g = (rows_p.reshape(cells, SUB, LANES, wpad)
              .transpose(0, 3, 1, 2).reshape(cells * wpad * SUB, LANES))
    bit0_g = np.zeros((cells * SUB, LANES), np.int32)
    nbits_g = bl.astype(np.int32).reshape(cells * SUB, LANES)
    ub32 = np.zeros((1, 32), np.uint32); ub32[0, :np.asarray(ub).size] = np.asarray(ub)
    dd32 = np.zeros((1, 32), np.int32); dd32[0, :np.asarray(dd).size] = np.asarray(dd)
    perm = np.asarray(perm4, np.uint32).reshape(1, 64)
    return (jnp.asarray(rows_g), jnp.asarray(bit0_g), jnp.asarray(nbits_g),
            jnp.asarray(ub32), jnp.asarray(dd32), jnp.asarray(perm), cells)


for BL, S in ((128, 8), (128, 4), (256, 8), (64, 8)):
    try:
        rows, bl = prep(BL)
        args = to_kernel_layout(rows, bl, S)
        rows_g, bit0_g, nbits_g, ub32, dd32, perm, cells = args
        t0 = time.time()
        out = _decode_call(rows_g, bit0_g, nbits_g, ub32, dd32, perm,
                           ml, BL, S, False)
        outs = np.asarray(out)
        print(f"  [{ts()}] pdec BL={BL} S={S}: compiled+ran {time.time()-t0:.1f}s", flush=True)
        o = outs.reshape(cells, BL, SUB, LANES).transpose(0, 2, 3, 1).reshape(-1, BL)
        ok = np.array_equal(o.astype(np.uint8), data.reshape(-1, BL))
        def make(K):
            @jax.jit
            def run(r):
                def body(i, acc):
                    o = _decode_call(jnp.roll(r, i, axis=1), bit0_g, nbits_g,
                                     ub32, dd32, perm, ml, BL, S, False)
                    return acc + o[0, 0] + o[-1, -1]
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        rs = {}
        for K in (1, 3):
            f = make(K)
            tc = time.time(); int(f(rows_g))
            print(f"    [{ts()}] K={K} compile+run {time.time()-tc:.1f}s", flush=True)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter(); int(f(rows_g)); best = min(best, time.perf_counter()-t0)
            rs[K] = best
        per = (rs[3]-rs[1])/2
        print(f"pdec BL={BL:4d} S={S}: {'OK' if ok else 'MISMATCH'} "
              f"{per*1e3:.2f} ms/iter = {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"pdec BL={BL} S={S}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)
print("ALL DONE", flush=True)

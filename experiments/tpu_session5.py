"""TPU session 5: gather-free scan decoder on HW + pallas shape bisect.

Decode model: per scan step the (B, W) word buffer is re-written (roll),
so HBM traffic ~= 2 * compressed_size * block_len and VPU cost ~2W/symbol
=> smaller blocks should be faster.  Measure block_len 2048 vs 512.
Pallas: N=64 ungridded compiled (s3) but N=2048 gridded crashed (s4) —
bisect N and grid separately, LAST.
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
from tpuhuff.core.codec import pack_codes_u8
from tpuhuff.kernels.decode import (
    decode_blocks_device, make_decode_tables, payload_to_lane_words,
)
from tpuhuff.kernels.encode import encode_blocks, make_encode_tables

rng = np.random.default_rng(0)
MB = 16
n = MB << 20
text = (
    b"the of and to in a is that it was for on are as with his they at "
    b"<page><title>Benchmark</title><revision><text xml:space=\"preserve\">"
    b"In information theory, a Huffman code is a particular type of optimal "
    b"prefix code that is commonly used for lossless data compression. "
)
data = np.frombuffer(text * (n // len(text) + 1), dtype=np.uint8)[:n].copy()
idx = rng.integers(0, n, n // 64)
data[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)
tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
lens_t, codes_t = tree.encode_tables()
ML = int(lens_t.max())
thr, sym4, len4 = make_decode_tables(tree)
dl, da = make_encode_tables(lens_t, codes_t)


def prep(block_len):
    # host-encode via the device encoder on CPU arrays is slow; pack per
    # block on host quickly using the XLA CPU... simplest: encode on device
    B = n // block_len
    blocks = data.reshape(B, block_len)
    w, bl = encode_blocks(jnp.asarray(blocks), dl, da, max_code_len=ML)
    w = np.asarray(w)
    bl = np.asarray(bl).astype(np.int64)
    # build per-lane rows directly from per-block words (no global stitch
    # needed: each lane starts at bit 0 of its own row)
    ends = bl
    Wmax = int(((ends + 31) // 32).max()) + 1
    rows = np.zeros((B, Wmax), dtype=np.uint32)
    m = min(w.shape[1], Wmax)
    rows[:, :m] = w[:, :m]
    bit0 = np.zeros(B, np.int32)
    nbits = bl.astype(np.int32)
    return jnp.asarray(rows), jnp.asarray(bit0), jnp.asarray(nbits), B, Wmax


def amortized_dec(name, rows, bit0, nbits, block_len, K1=1, K2=3):
    try:
        def make(K):
            @jax.jit
            def run(r):
                def body(i, acc):
                    out = decode_blocks_device(
                        jnp.roll(r, i, axis=0), bit0, nbits, thr, sym4, len4,
                        block_len)
                    return acc + out[0, 0].astype(jnp.int32) + out[-1, -1].astype(jnp.int32)
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run
        rs = {}
        for K in (K1, K2):
            f = make(K)
            tc = time.time(); int(f(rows))
            print(f"  [{ts()}] {name} K={K} compile+run {time.time()-tc:.1f}s", flush=True)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter(); int(f(rows)); best = min(best, time.perf_counter()-t0)
            rs[K] = best
        per = (rs[K2]-rs[K1])/(K2-K1)
        print(f"{name}: {per*1e3:.2f} ms/iter = {n/max(per,1e-9)/1e9:.2f} GB/s (decoded bytes)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)


for BL in (2048, 512):
    rows, bit0, nbits, B, Wmax = prep(BL)
    print(f"[{ts()}] block_len={BL}: B={B} lanes, W={Wmax} words "
          f"({rows.size*4/1e6:.1f} MB rows)", flush=True)
    # correctness on a slice
    out = np.asarray(decode_blocks_device(rows[:64], bit0[:64], nbits[:64],
                                          thr, sym4, len4, BL))
    ok = np.array_equal(out, data.reshape(-1, BL)[:64])
    print(f"decode correctness block={BL}: {'OK' if ok else 'MISMATCH'}", flush=True)
    amortized_dec(f"dec-{BL:4d}", rows, bit0, nbits, BL)

# ---- pallas bisect LAST ----
print(f"[{ts()}] pallas shape bisect (risky)", flush=True)
from tpuhuff.kernels.pallas_encode import pack_blocks_pallas

def try_pack(name, N, B):
    try:
        ac = jnp.asarray(rng.integers(0, 2**31, (N, B), dtype=np.uint32))
        ln = jnp.asarray(rng.integers(1, 12, (N, B), dtype=np.int32))
        w, b = pack_blocks_pallas(ac, ln)
        _ = np.asarray(b).ravel()[0]
        print(f"{name} (N={N}, B={B}): OK", flush=True)
        return True
    except Exception as e:
        print(f"{name} (N={N}, B={B}): FAIL {type(e).__name__} {str(e)[:120]}", flush=True)
        return False

ok = try_pack("p-256-nogrid", 256, 128)
if ok:
    ok = try_pack("p-1024-nogrid", 1024, 128)
if ok:
    ok = try_pack("p-2048-nogrid", 2048, 128)
ok2 = try_pack("p-64-grid2", 64, 256)
if ok2:
    try_pack("p-256-grid4", 256, 512)
print("ALL DONE", flush=True)

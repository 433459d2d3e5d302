"""TPU probe 1: honest timings of encode/decode kernels + gather micro.

One process, everything batched (tunnel init costs ~90s).  Methodology:
distinct pre-uploaded buffers per iteration + forced scalar fetch.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

print("jax init...", flush=True)
t0 = time.time()
dev = jax.devices()[0]
print(f"device {dev} in {time.time()-t0:.1f}s", flush=True)

from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels.encode import encode_blocks, make_encode_tables
from tpuhuff.kernels.histogram import histogram
from tpuhuff.kernels.decode import decode_blocks_device, make_decode_tables

def timeit(fn, args_list, iters=8):
    for a in args_list:
        jax.block_until_ready(fn(*a))
    times = []
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        times.append(time.perf_counter() - t0)
    return min(times), sorted(times)[len(times) // 2]

rng = np.random.default_rng(0)
MB = 16
n = MB << 20
data = rng.integers(0, 64, n, dtype=np.uint8)
tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
dl, da = make_encode_tables(*tree.encode_tables())
jd, ja = jnp.asarray(dl), jnp.asarray(da)

for block_len in (16384, 65536):
    B = n // block_len
    blocks = data.reshape(B, block_len)
    bufs = [jnp.asarray(np.roll(blocks, k, axis=0)) for k in range(3)]

    @jax.jit
    def full(b):
        w, bits = encode_blocks(b, jd, ja)
        return jnp.sum(bits) + w[0, 0].astype(jnp.int64)

    @jax.jit
    def lut_only(b):
        lens = jnp.take(jd, b.astype(jnp.int32), axis=0)
        ac = jnp.take(ja, b.astype(jnp.int32), axis=0)
        return jnp.sum(lens) + jnp.sum(ac).astype(jnp.int64)

    @jax.jit
    def hist_only(b):
        return histogram(b)[0]

    for name, fn in (("lut", lut_only), ("hist", hist_only), ("full", full)):
        t0 = time.time()
        jax.block_until_ready(fn(bufs[0]))
        cs = time.time() - t0
        best, med = timeit(fn, [(b,) for b in bufs])
        print(f"encode block={block_len} {name}: compile {cs:.1f}s  "
              f"best {best*1e3:.2f}ms ({n/best/1e9:.1f} GB/s)  "
              f"med {med*1e3:.2f}ms ({n/med/1e9:.1f} GB/s)", flush=True)

# ---- decode kernel ----
from tpuhuff.core.codec import pack_codes_u8
from tpuhuff.kernels.decode import payload_to_lane_words
lens_lut, codes_lut = tree.encode_tables()
for dec_block in (2048, 4096):
    Bd = n // dec_block
    bits = lens_lut[data].astype(np.int64)
    block_bits = np.add.reduceat(bits, np.arange(0, n, dec_block))
    ends = np.cumsum(block_bits); starts = ends - block_bits
    from tpuhuff import native
    payload, pad = native.encode(data, lens_lut, codes_lut)
    rows, bit0 = payload_to_lane_words(payload, starts, ends, dec_block)
    thr, syms, lns = make_decode_tables(tree)
    jrows = jnp.asarray(rows); jbit0 = jnp.asarray(bit0)
    jnb = jnp.asarray((ends - starts).astype(np.int32))

    @jax.jit
    def dec(r, b0, nb):
        out = decode_blocks_device(r, b0, nb, thr, syms, lns, dec_block)
        return out[0, 0].astype(jnp.int32) + out[-1, -1].astype(jnp.int32)

    t0 = time.time()
    jax.block_until_ready(dec(jrows, jbit0, jnb))
    cs = time.time() - t0
    best, med = timeit(dec, [(jrows, jbit0, jnb)], iters=4)
    print(f"decode block={dec_block} lanes={Bd}: compile {cs:.1f}s  "
          f"best {best*1e3:.1f}ms ({n/best/1e9:.2f} GB/s)  "
          f"med {med*1e3:.1f}ms ({n/med/1e9:.2f} GB/s)", flush=True)

print("done", flush=True)

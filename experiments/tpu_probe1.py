"""TPU probe 1: honest timings of the encode kernel + components.

Methodology notes (axon tunnel): iterate over DISTINCT pre-uploaded buffers
and force a scalar fetch per step, so no layer can cache or elide work.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels.encode import encode_blocks, make_encode_tables, _merge_level
from tpuhuff.kernels.histogram import histogram

def timeit(fn, args_list, iters=6):
    # one warmup on each distinct arg set
    for a in args_list:
        jax.block_until_ready(fn(*a))
    times = []
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        times.append(time.perf_counter() - t0)
    return min(times), sorted(times)[len(times)//2]

def main():
    rng = np.random.default_rng(0)
    MB = 16
    n = MB << 20
    data = rng.integers(0, 64, n, dtype=np.uint8)
    tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
    dl, da = make_encode_tables(*tree.encode_tables())
    for block_len in (16384, 65536):
        B = n // block_len
        blocks = data.reshape(B, block_len)
        bufs = []
        for k in range(3):
            bufs.append(jnp.asarray(np.roll(blocks, k, axis=0)))
        jd = jnp.asarray(dl); ja = jnp.asarray(da)

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
            compile_s = time.time() - t0
            best, med = timeit(fn, [(b,) for b in bufs])
            print(f"block={block_len} {name}: compile {compile_s:.1f}s  "
                  f"best {best*1e3:.2f}ms ({n/best/1e9:.1f} GB/s)  "
                  f"med {med*1e3:.2f}ms ({n/med/1e9:.1f} GB/s)", flush=True)

if __name__ == "__main__":
    main()

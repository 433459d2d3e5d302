"""Round-2 session 2: bisect the pack_pairs 218 s XLA compile.

Each variant compiles ONE small jitted program on (65536, 256) u8 input and
prints compile+first time.  Run: python tpu_r2_s2.py <variant>

variants:
  roll      sum(roll(b, i))                      — the bench's input variation
  pairs     sum(d[:,0::2] | d[:,1::2]<<8)        — strided pack, B-major, no T
  pairsT    sum(pack_pairs(b)) = pairs + .T      — the full transform
  T         sum(b.astype(i32).T contiguous)      — transpose alone
  pairsT_noroll  pack_pairs without the roll
  kern_bmajor    pallas kernel reading (B, rows) blocks, in-kernel transpose
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "pairs"


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    from tpuhuff.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev} variant={VARIANT}")
    rng = np.random.default_rng(0)
    B, N = 65536, 256
    blocks = rng.integers(0, 200, (B, N), dtype=np.uint8)
    jb = jax.device_put(jnp.asarray(blocks), dev)
    jb.block_until_ready()
    log("uploaded")

    def pairs(d):
        d = d.astype(jnp.int32)
        return d[:, 0::2] | (d[:, 1::2] << 8)

    if VARIANT == "roll":
        def fn(b, i):
            return jnp.sum(jnp.roll(b, i, axis=0).astype(jnp.int32))
    elif VARIANT == "pairs":
        def fn(b, i):
            return jnp.sum(pairs(jnp.roll(b, i, axis=0)))
    elif VARIANT == "pairsT":
        def fn(b, i):
            p = pairs(jnp.roll(b, i, axis=0)).T
            return jnp.sum(p)
    elif VARIANT == "pairsT_noroll":
        def fn(b, i):
            return jnp.sum(pairs(b).T) + i
    elif VARIANT == "T":
        def fn(b, i):
            t = jnp.roll(b, i, axis=0).astype(jnp.int32).T
            return jnp.sum(t * t[0:1])  # keep the transposed layout live
    else:
        raise SystemExit(f"unknown variant {VARIANT}")

    @jax.jit
    def run(b):
        return jax.lax.fori_loop(0, 2, lambda i, a: a + fn(b, i),
                                 jnp.int32(0))

    t0 = time.time()
    int(run(jb))
    log(f"compile+first {time.time()-t0:.1f}s")
    t0 = time.perf_counter()
    int(run(jb))
    log(f"second {time.perf_counter()-t0:.3f}s")


if __name__ == "__main__":
    main()

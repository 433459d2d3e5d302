"""Round-2 session 3: isolate the one-time ~150-220 s compile cost.

Compiles a LADDER of programs in one process, smallest first, timing each.
Whichever step first pays the ~3 min tells us the trigger (process-level
warmup vs a specific op/layout).  Then re-run to check cross-process
caching.  Usage: python tpu_r2_s3.py [order]
order = "updown" (default: tiny->big) or "bigfirst" (pack_pairs first)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ORDER = sys.argv[1] if len(sys.argv) > 1 else "updown"


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    from tpuhuff.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev} order={ORDER}")
    rng = np.random.default_rng(0)
    B, N = 65536, 256
    blocks = rng.integers(0, 200, (B, N), dtype=np.uint8)
    jb = jax.device_put(jnp.asarray(blocks), dev)
    small = jax.device_put(jnp.asarray(blocks[:64, :128].astype(np.int32)), dev)
    jb.block_until_ready()
    small.block_until_ready()
    log("uploaded")

    def step(name, fn, arg):
        t0 = time.time()
        f = jax.jit(fn)
        r = f(arg)
        jax.block_until_ready(r)
        v = np.asarray(r).ravel()[0]
        log(f"{name}: compile+first {time.time()-t0:.1f}s (v={v})")

    def pairs(d):
        d = d.astype(jnp.int32)
        return d[:, 0::2] | (d[:, 1::2] << 8)

    ladder = [
        ("tiny_sum", lambda x: jnp.sum(x), small),
        ("big_cast_sum", lambda x: jnp.sum(x.astype(jnp.int32)), jb),
        ("big_reshape_sum", lambda x: jnp.sum(
            x.reshape(-1)[: 1 << 22].astype(jnp.int32)), jb),
        ("strided_slice", lambda x: jnp.sum(x[:, 0::2].astype(jnp.int32)), jb),
        ("pairs", lambda x: jnp.sum(pairs(x)), jb),
        ("pairsT", lambda x: jnp.sum(pairs(x).T * 1), jb),
        ("transpose_i32", lambda x: jnp.sum(
            x.astype(jnp.int32).T[:, ::7]), jb),
    ]
    if ORDER == "bigfirst":
        ladder = ladder[4:5] + ladder[:4] + ladder[5:]
    for name, fn, arg in ladder:
        step(name, fn, arg)


if __name__ == "__main__":
    main()

import os, sys, time
sys.path.insert(0, '/root/repo')
from tpuhuff.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from bench import make_textlike
from tpuhuff.core.canonical import canonicalize
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels.encode import make_canonical_encode_tables, make_encode_tables, encode_blocks

n = 100 << 20
LANE = 256
data = make_textlike(n)
B = n // LANE
tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
lens_lut, codes_lut = tree.encode_tables()
dl, da = make_encode_tables(lens_lut, codes_lut)
canon = make_canonical_encode_tables(tree)
ML = int(np.asarray(lens_lut).max())
jb = jax.device_put(jnp.asarray(data.reshape(B, LANE)))
jb.block_until_ready()

def kslope(make, arg, label, K1=2, K2=16, REPS=4):
    times = {}
    for K in (K1, K2):
        f = make(K)
        t0 = time.time(); int(f(arg)); print(f"  {label} K={K}: compile {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter(); int(f(arg)); best = min(best, time.perf_counter()-t0)
        times[K] = best
    return (times[K2]-times[K1])/(K2-K1)

for G in ("1", "2", "4", "8"):
    os.environ["TPUHUFF_ENC_GROUPS"] = G
    jax.clear_caches()
    def make(K):
        @jax.jit
        def run(b):
            def body(i, acc):
                valid = jnp.full(B, LANE, jnp.int32).at[B - 1].set(LANE - (i & 1))
                words, bits = encode_blocks(b, dl, da, valid, max_code_len=ML,
                                            canon_tables=canon[:4],
                                            full_alphabet=bool(canon[5]))
                return acc + (jnp.sum(bits).astype(jnp.int32) & 0xFFFF)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run
    per = kslope(make, jb, f"G={G}")
    print(f"G={G}: {per*1e3:.2f} ms -> {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)

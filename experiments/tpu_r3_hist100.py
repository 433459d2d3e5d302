import sys, time
sys.path.insert(0, '/root/repo')
from tpuhuff.cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from bench import make_textlike
from tpuhuff.kernels.histogram import histogram, histogram_xla
from tpuhuff.kernels.pallas_histogram import histogram_pallas

n = 100 << 20
data = make_textlike(n)
ref = np.bincount(data, minlength=256)
j2d = jax.device_put(jnp.asarray(data.reshape(-1, 256)))
j2d.block_until_ready()
got = np.asarray(histogram_pallas(j2d))
print("pallas correct:", np.array_equal(got, ref))

def kslope(make, arg, label, K1=2, K2=16, REPS=4):
    times = {}
    for K in (K1, K2):
        f = make(K)
        t0 = time.time(); int(f(arg)); print(f"  {label} K={K}: compile+first {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter(); int(f(arg)); best = min(best, time.perf_counter()-t0)
        times[K] = best
    return (times[K2]-times[K1])/(K2-K1)

for label, fn, with_roll in (("pallas+roll", histogram_pallas, True),
                             ("pallas noroll", histogram_pallas, False),
                             ("xla+roll", histogram_xla, True)):
    def make(K, fn=fn, with_roll=with_roll):
        @jax.jit
        def run(b):
            def body(i, acc):
                x = jnp.roll(b, i, axis=0) if with_roll else b
                h = fn(x)
                return acc + (h[3 + i % 2] & 0xFFFF)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run
    per = kslope(make, j2d, label)
    print(f"{label}: {per*1e3:.2f} ms -> {n/max(per,1e-9)/1e9:.2f} GB/s", flush=True)

"""r5 encode-ladder attack (VERDICT r4 #8): A/B the per-symbol resolve.

Variants at 100 MiB, honest consumption, K-slope:
  A. production — canonical ladder, natural tree (ML=14 on this corpus)
  B. canonical ladder, 12-limited tree (2 fewer ladder levels)
  C. combined-entry tables, 12-limited tree (TPUHUFF_ENC_COMBINED):
     two shared-predicate 64-select trees over (acode12<<4)|len —
     no serial compare chain, no int multiplies, membership free.

Also reports the ratio cost of 12-limiting the tree (package-merge).
Run on TPU: python experiments/r5_ladder.py   (BENCH_MB=16 for quick)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuhuff.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from tpuhuff.core.canonical import build_tree_for_device, canonicalize
from tpuhuff.core.codec import pack_codes_u8
from tpuhuff.core.tree import HuffTree
from tpuhuff.core.weights import ByteWeights
from tpuhuff.kernels import pallas_encode2 as pe2
from tpuhuff.kernels.encode import (
    make_canonical_encode_tables,
    make_combined_encode_tables,
    words_to_payload,
)
from tpuhuff.kernels.pallas_encode2 import encode_blocks_pallas2

MB = int(os.environ.get("BENCH_MB", "100"))
LANE = 256
K1, K2, REPS = 2, 32, 3


def make_textlike(n):
    rng = np.random.default_rng(42)
    text = (
        b"the of and to in a is that it was for on are as with his they at "
        b"<page><title>Benchmark</title><revision><text xml:space=\"preserve\">"
        b"In information theory, a Huffman code is a particular type of optimal "
        b"prefix code that is commonly used for lossless data compression. "
    )
    base = np.frombuffer(text * (n // len(text) + 1), dtype=np.uint8)[:n].copy()
    idx = rng.integers(0, n, n // 64)
    base[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)
    return base


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    n = MB << 20
    data = make_textlike(n)
    B = n // LANE
    lanes = data.reshape(B, LANE)
    bw = ByteWeights.from_bytes(data)
    t14 = canonicalize(HuffTree.from_weights(bw))
    ml14 = t14.max_code_len()
    t12, limited = build_tree_for_device(bw, max_len=12)
    t12 = canonicalize(t12)
    lens14, _ = t14.encode_tables()
    lens12, _ = t12.encode_tables()
    counts = bw.counts.astype(np.int64)
    bits14 = int((counts * np.asarray(lens14, np.int64)).sum())
    bits12 = int((counts * np.asarray(lens12, np.int64)).sum())
    log(f"tree: natural ML={ml14}, 12-limited (engaged={limited}); ratio "
        f"cost of 12-limit: {100 * (bits12 - bits14) / bits14:.4f}% "
        f"({bits12 - bits14} extra bits / {bits14})")

    tabs14 = make_canonical_encode_tables(t14)
    tabs12 = make_canonical_encode_tables(t12)
    ctabs = make_combined_encode_tables(t12)
    assert ctabs is not None

    jl = jax.device_put(jnp.asarray(lanes))
    jl.block_until_ready()

    def consume(words):
        wb = jax.lax.bitcast_convert_type(words[..., None], jnp.uint8)
        return jnp.sum(wb.astype(jnp.int32)) & 0xFFFF

    def make_run(tabs, ml, full):
        t4 = tuple(tabs[:4])

        @jax.jit
        def run(b, K):
            def body(i, acc):
                valid = jnp.full(B, LANE, jnp.int32).at[B - 1].set(
                    LANE - (i & 1))
                w, bits = encode_blocks_pallas2(b, t4, ml, valid,
                                                interpret=interp,
                                                full_alphabet=full)
                return (acc + jnp.sum(bits) + consume(w)).astype(
                    jnp.int32) & 0xFFFF
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    def kslope(run, label):
        times = {}
        for K in (K1, K2):
            t0 = time.time()
            int(run(jl, K))
            log(f"{label} K={K}: compile+first {time.time()-t0:.1f}s")
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                int(run(jl, K))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        per = (times[K2] - times[K1]) / (K2 - K1)
        gbps = n / max(per, 1e-9) / 1e9
        log(f"{label}: {per*1e3:.2f} ms/iter -> {gbps:.2f} GB/s")
        return gbps

    def check(tabs, ml, full, tree, label):
        w, bits = encode_blocks_pallas2(jl[:1024], tuple(tabs[:4]), ml,
                                        interpret=interp,
                                        full_alphabet=full)
        ll, cc = tree.encode_tables()
        ref, _ = pack_codes_u8(lanes[0], ll, cc)
        got = words_to_payload(np.asarray(w[0]), int(bits[0]))
        assert got == ref, f"{label}: bit-exactness FAILED"
        log(f"{label}: bit-exact OK")

    results = {}
    # A: production ladder, ML=14
    check(tabs14, tabs14[4], tabs14[5], t14, "A ladder ML14")
    results["A_ladder_ml14"] = kslope(
        make_run(tabs14, tabs14[4], tabs14[5]), "A ladder ML14")
    # B: ladder, 12-limited
    check(tabs12, tabs12[4], tabs12[5], t12, "B ladder ML12")
    results["B_ladder_ml12"] = kslope(
        make_run(tabs12, tabs12[4], tabs12[5]), "B ladder ML12")
    # C: combined tables, 12-limited
    pe2.ENC_COMBINED = True
    pe2._encode_call_fused.clear_cache()
    pe2._encode_call.clear_cache()
    pe2._encode_call_cells.clear_cache()
    try:
        check(ctabs, ctabs[4], ctabs[5], t12, "C combined ML12")
        results["C_combined_ml12"] = kslope(
            make_run(ctabs, ctabs[4], ctabs[5]), "C combined ML12")
    finally:
        pe2.ENC_COMBINED = False
        pe2._encode_call_fused.clear_cache()
    print(results)


if __name__ == "__main__":
    main()

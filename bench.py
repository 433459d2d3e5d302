"""Benchmark: single-chip block-parallel Huffman encode throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config-2 style workload (BASELINE.md): ~enwik-like text, 64 KB blocks,
device-side histogram + pack, steady-state timing after compile.  The
baseline share is the north star (>= 10 GB/s aggregate on a v5p-16, i.e.
8 chips) divided per chip: 1.25 GB/s.  vs_baseline > 1 beats it.

Extra diagnostic timings go to stderr; the driver consumes stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

PER_CHIP_BASELINE_GBPS = 10.0 / 8.0  # north-star aggregate / v5p-16 chips

# tunables (overridable for experiments)
DATA_MB = int(os.environ.get("BENCH_MB", "64"))
BLOCK_LEN = int(os.environ.get("BENCH_BLOCK", "65536"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_textlike(n: int) -> np.ndarray:
    """enwik8-style byte distribution: skewed text + markup + some binary."""
    rng = np.random.default_rng(42)
    text = (
        b"the of and to in a is that it was for on are as with his they at "
        b"<page><title>Benchmark</title><revision><text xml:space=\"preserve\">"
        b"In information theory, a Huffman code is a particular type of optimal "
        b"prefix code that is commonly used for lossless data compression. "
    )
    base = np.frombuffer(text * (n // len(text) + 1), dtype=np.uint8)[:n].copy()
    # sprinkle some high bytes so the alphabet is realistic
    idx = rng.integers(0, n, n // 64)
    base[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)
    return base


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpuhuff.core.codec import pack_codes_u8
    from tpuhuff.core.tree import HuffTree
    from tpuhuff.core.weights import ByteWeights
    from tpuhuff.dist.block import pad_to_blocks
    from tpuhuff.kernels.encode import encode_blocks, make_encode_tables
    from tpuhuff.kernels.histogram import histogram

    dev = jax.devices()[0]
    log(f"device: {dev} ({jax.default_backend()})")

    n = DATA_MB << 20
    data = make_textlike(n)
    blocks, valid, _ = pad_to_blocks(data, BLOCK_LEN, 1)
    log(f"data: {DATA_MB} MiB, {blocks.shape[0]} blocks of {BLOCK_LEN}")

    tree = HuffTree.from_weights(ByteWeights.from_bytes(data))
    dl, da = make_encode_tables(*tree.encode_tables())

    jblocks = jax.device_put(jnp.asarray(blocks), dev)
    jvalid = jax.device_put(jnp.asarray(valid), dev)
    dl = jax.device_put(dl, dev)
    da = jax.device_put(da, dev)

    @jax.jit
    def step(b, v, l, a):
        h = histogram(b)
        words, bits = encode_blocks(b, l, a, v)
        return h, words, bits

    t0 = time.time()
    h, words, bits = jax.block_until_ready(step(jblocks, jvalid, dl, da))
    log(f"compile+first run: {time.time()-t0:.1f}s")

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(step(jblocks, jvalid, dl, da))
        times.append(time.perf_counter() - t0)
    best = min(times)
    gbps = n / best / 1e9
    log(f"iters: {[f'{t*1e3:.1f}ms' for t in times]} -> best {best*1e3:.1f}ms "
        f"= {gbps:.2f} GB/s")

    # correctness: first block must match the scalar host packer bit-for-bit
    lens, codes = tree.encode_tables()
    ref, ref_pad = pack_codes_u8(blocks[0], lens, codes)
    from tpuhuff.kernels.encode import words_to_payload

    got = words_to_payload(np.asarray(words[0]), int(bits[0]))
    assert got == ref, "device output mismatch vs host reference"
    log("bit-exactness vs host packer: OK")

    print(json.dumps({
        "metric": "encode_throughput_1chip",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / PER_CHIP_BASELINE_GBPS, 3),
    }))


if __name__ == "__main__":
    main()

"""Benchmark: single-chip block-parallel Huffman encode throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology (important on tunneled/relayed TPU attachments): the device
step runs K iterations inside ONE jitted ``fori_loop`` with device-side
input variation, and the per-iteration time is the slope between a K1-run
and a K2-run — this cancels dispatch-floor latency and any host<->device
transfer artifacts exactly, measuring true device kernel time.

Workload: config-2 style (BASELINE.md) — enwik-like text, 64 KB blocks,
device histogram + device bit-pack of every block.  Baseline share: the
north star (>= 10 GB/s aggregate on a v5p-16, counted as 8 chips) is
1.25 GB/s per chip; vs_baseline > 1 beats it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

PER_CHIP_BASELINE_GBPS = 10.0 / 8.0

DATA_MB = int(os.environ.get("BENCH_MB", "16"))
BLOCK_LEN = int(os.environ.get("BENCH_BLOCK", "256"))  # session 13 pallas optimum
DEC_BLOCK = int(os.environ.get("BENCH_DEC_BLOCK", "128"))
K1 = int(os.environ.get("BENCH_K1", "2"))
K2 = int(os.environ.get("BENCH_K2", "16"))  # wide spread: slope error ~1/(K2-K1)
REPS = int(os.environ.get("BENCH_REPS", "5"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_textlike(n: int) -> np.ndarray:
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


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpuhuff.core.codec import pack_codes_u8
    from tpuhuff.core.tree import HuffTree
    from tpuhuff.core.weights import ByteWeights
    from tpuhuff.kernels.encode import encode_blocks, make_encode_tables, words_to_payload
    from tpuhuff.kernels.histogram import histogram

    dev = jax.devices()[0]
    log(f"device: {dev} ({jax.default_backend()})")

    from tpuhuff.core.canonical import canonicalize
    from tpuhuff.kernels.encode import make_canonical_encode_tables

    n = DATA_MB << 20
    data = make_textlike(n)
    B = n // BLOCK_LEN
    blocks_np = data[: B * BLOCK_LEN].reshape(B, BLOCK_LEN)
    # canonical codes: identical compressed size, ~3x cheaper symbol lookup
    # (ladder instead of 256-entry select trees) and ladder-decodable
    tree = canonicalize(HuffTree.from_weights(ByteWeights.from_bytes(data)))
    lens_lut, codes_lut = tree.encode_tables()
    dl, da = make_encode_tables(lens_lut, codes_lut)
    canon = make_canonical_encode_tables(tree)
    canon_tabs = canon[:4] if canon is not None else None
    ML = int(lens_lut.max())
    log(f"max code len: {ML}; canonical ladder: {canon_tabs is not None}")

    t0 = time.time()
    jblocks = jax.device_put(jnp.asarray(blocks_np), dev)
    dl = jax.device_put(dl, dev)
    da = jax.device_put(da, dev)
    log(f"upload {DATA_MB} MiB: {time.time()-t0:.1f}s; {B} blocks of {BLOCK_LEN}")

    # device-side variation that stays inside the tree's alphabet: roll the
    # block axis so every iteration packs a different (but valid) batch
    def one_iter(b, i):
        rolled = jnp.roll(b, i, axis=0)
        h = histogram(rolled)
        words, bits = encode_blocks(rolled, dl, da, max_code_len=ML,
                                    canon_tables=canon_tabs)
        return (jnp.sum(bits) + h[0]).astype(jnp.int32) & 0xFFFF

    def make(K):
        @jax.jit
        def run(b):
            return jax.lax.fori_loop(
                0, K, lambda i, acc: acc + one_iter(b, i), jnp.int32(0)
            )
        return run

    times = {}
    for K in (K1, K2):
        f = make(K)
        t0 = time.time()
        int(f(jblocks))
        log(f"K={K}: compile+first {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            int(f(jblocks))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
        log(f"K={K}: best total {best*1e3:.1f}ms")
    per_iter = (times[K2] - times[K1]) / (K2 - K1)
    gbps = n / max(per_iter, 1e-9) / 1e9
    log(f"per-iter device time {per_iter*1e3:.2f}ms -> {gbps:.2f} GB/s")

    # correctness: device words for block 0 must match the scalar host packer
    words, bits = encode_blocks(jblocks, dl, da, max_code_len=ML,
                                canon_tables=canon_tabs)
    lens, codes = lens_lut, codes_lut
    ref, _ = pack_codes_u8(blocks_np[0], lens, codes)
    got = words_to_payload(np.asarray(words[0]), int(bits[0]))
    assert got == ref, "device output mismatch vs host reference"
    log("bit-exactness vs host packer: OK")

    # secondary: decode throughput via the production Pallas canonical
    # kernel (logged, not the metric)
    try:
        from tpuhuff.kernels.decode import make_canonical_decode_tables
        from tpuhuff.kernels.pallas_decode import (
            SUB, LANES, _decode_call, decode_blocks_pallas_canonical,
        )

        Bd = n // DEC_BLOCK
        wd, bd = encode_blocks(
            jnp.asarray(data[: Bd * DEC_BLOCK].reshape(Bd, DEC_BLOCK)),
            dl, da, max_code_len=ML, canon_tables=canon_tabs)
        wd = np.asarray(wd)
        bd_np = np.asarray(bd).astype(np.int64)
        Wmax = int(((bd_np + 31) // 32).max()) + 1
        rows = np.zeros((Bd, Wmax), dtype=np.uint32)
        rows[:, : min(wd.shape[1], Wmax)] = wd[:, : min(wd.shape[1], Wmax)]
        ub, dd, perm4, ml = make_canonical_decode_tables(tree)
        unroll = 8 if DEC_BLOCK % 8 == 0 else 1
        # correctness through the public wrapper (includes layout shuffles)
        out = decode_blocks_pallas_canonical(
            rows, np.zeros(Bd, np.int32), bd_np.astype(np.int32),
            ub, dd, perm4, ml, DEC_BLOCK, unroll=unroll)
        assert np.array_equal(out, data[: Bd * DEC_BLOCK].reshape(-1, DEC_BLOCK))
        # throughput on the kernel-layout arrays (device-resident)
        S = unroll
        wpad = max(Wmax, S + 1)
        rows_p = np.zeros((Bd, wpad), np.uint32)
        rows_p[:, :Wmax] = rows
        cells = Bd // (SUB * LANES)
        rows_g = jax.device_put(jnp.asarray(
            rows_p.reshape(cells, SUB, LANES, wpad)
            .transpose(0, 3, 1, 2).reshape(cells * wpad * SUB, LANES)), dev)
        bit0_g = jnp.zeros((cells * SUB, LANES), jnp.int32)
        nbits_g = jnp.asarray(
            bd_np.astype(np.int32).reshape(cells * SUB, LANES))
        ub32 = np.zeros((1, 32), np.uint32)
        ub32[0, : np.asarray(ub).size] = np.asarray(ub)
        dd32 = np.zeros((1, 32), np.int32)
        dd32[0, : np.asarray(dd).size] = np.asarray(dd)
        perm = np.asarray(perm4, np.uint32).reshape(1, 64)
        jub, jdd, jperm = (jnp.asarray(ub32), jnp.asarray(dd32),
                           jnp.asarray(perm))

        def dmake(K):
            @jax.jit
            def run(r):
                def body(i, acc):
                    o = _decode_call(jnp.roll(r, i, axis=1), bit0_g, nbits_g,
                                     jub, jdd, jperm, ml, DEC_BLOCK, S, False)
                    return acc + o[0, 0] + o[-1, -1]
                return jax.lax.fori_loop(0, K, body, jnp.int32(0))
            return run

        dt = {}
        for K in (K1, K2):
            f = dmake(K)
            int(f(rows_g))
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                int(f(rows_g))
                best = min(best, time.perf_counter() - t0)
            dt[K] = best
        dper = (dt[K2] - dt[K1]) / (K2 - K1)
        dgbps = n / max(dper, 1e-9) / 1e9
        log(f"decode (pallas canonical, BL={DEC_BLOCK}): {dper*1e3:.2f}ms -> {dgbps:.2f} GB/s, bit-exact OK")
    except Exception as e:  # decode is informational; never fail the bench
        log(f"decode bench skipped: {type(e).__name__}: {e}")

    print(json.dumps({
        "metric": "encode_throughput_1chip",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / PER_CHIP_BASELINE_GBPS, 3),
    }))


if __name__ == "__main__":
    main()

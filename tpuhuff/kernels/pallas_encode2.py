"""Pallas TPU kernel v2: fused canonical-LUT + width-bounded VMEM bit-merge.

Differences from :mod:`pallas_encode` (v1), driven by sessions 6-12:

* **Fused symbol lookup.** The canonical ladder LUT (inverse-permutation
  rank + compare ladder, ~110 ops/symbol vs ~320 for the dense select
  trees) runs inside the kernel, so per-symbol (len, acode) never touch
  HBM.  Requires canonical codes — what the pipeline emits by default.
* **Halved merge rows.** When ``2*max_len <= 32`` each int32 input element
  carries a *pair* of symbols (``sym0 | sym1 << 8``, packed by XLA outside
  the kernel, where strided slices are native); the kernel runs the ladder
  on both bytes and merges the pair inside one u32, so every merge level
  runs on N/2 rows.  Session 12 showed the in-kernel stride-2 compaction
  (``x[0::2]``) lowers to ``lax.gather``, which Mosaic rejects
  ("Shape mismatch in input, indices and output") — packing the pairs in
  the *layout* instead keeps the kernel gather-free.
* **Width-bounded shift trees.** At each level the A-part bit length is
  bounded by ``ML * group_syms``, so the word-granularity roll needs only
  ``log2(bound/32)`` select levels after a static pre-roll — ~half of v1's
  full-depth trees.

Layout stays v1's: lanes = 128 blocks per grid cell, sublanes = words.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["encode_blocks_pallas2", "finalize_hist8"]

LANES = 128

# stacked-ladder LUT (one pass over both byte planes) — bit-identical but
# measured SLOWER on v5e (2.00 ms vs 1.60 ms per 16 MiB: the (2*rows, 128)
# concats cost more than the saved instructions), so default OFF;
# TPUHUFF_STACK_LADDER=1 re-enables for experiments
import os as _os

_STACK_LADDER = _os.environ.get("TPUHUFF_STACK_LADDER", "0") == "1"

# lanes (blocks) per grid cell: wider cells amortize per-cell grid/DMA
# overhead at large batch (TPUHUFF_ENC_LANES, power-of-two multiple of 128)
CELL_LANES = int(_os.environ.get("TPUHUFF_ENC_LANES", "128"))


def _resolve_layout() -> str:
    layout = _os.environ.get("TPUHUFF_ENC_LAYOUT", "fused")
    if _os.environ.get("TPUHUFF_ENC_CELL", "1") == "0":
        layout = "flat"  # legacy A/B switch
    return layout


def _resolve_groups() -> int:
    """Default 8 (r5): the same-session sweep measured G = 2/4/8 ->
    11.08 / 11.67 / 12.15 GB/s honest with the traced-K program pair
    compiling in 7.2 / 15.9 s — G=8's +4% reproduces across sessions
    (r4: 12.10 vs 11.65) and its compile stays inside the <= 20 s budget
    now that one program serves both K points.  (r4 chose 4 when the
    budget was tighter; TPUHUFF_ENC_GROUPS overrides either way.)"""
    try:
        g = int(_os.environ.get("TPUHUFF_ENC_GROUPS", "8"))
    except ValueError:
        g = 8
    return max(1, g & -g)


# Layout / group knobs are resolved ONCE at import (ADVICE r3: reading the
# env inside jit-cached functions means a mid-process flip silently keeps
# serving the previously traced route).  Experiments that A/B these set the
# env var before importing, or assign the module attributes directly.
ENC_LAYOUT = _resolve_layout()
ENC_GROUPS = _resolve_groups()
# r5 experiment (VERDICT r4 #8): replace the rank-lookup + compare ladder
# with ONE pre-combined 16-bit entry per byte — (acode12 << 4) | len —
# evaluated as two 64-select nibble trees sharing the same bit predicates.
# Requires max code length <= 12 (a 12-limited tree) and combined tables
# in the canon_tables slots (kernels.encode.make_combined_encode_tables):
# inv4 slot = packed LOW bytes, cumle/dd slots = packed HIGH bytes.
# Slightly more raw ops than the ladder (~126 selects vs ~120 mixed) but
# ZERO serial dependency chain and zero integer multiplies.
ENC_COMBINED = _os.environ.get("TPUHUFF_ENC_COMBINED", "0") == "1"
# in-kernel MXU transpose of the words output into container row layout
# (r4): on by default; TPUHUFF_ENC_TOUT=0 restores the XLA-side inverse
# layout (_from_cells) for A/B
ENC_TOUT = _os.environ.get("TPUHUFF_ENC_TOUT", "1") == "1"


def _sel_scalar(bits, tab_ref, lo: int, size: int):
    if size == 1:
        return tab_ref[0, lo]
    half = size // 2
    level = half.bit_length() - 1
    lo_v = _sel_scalar(bits, tab_ref, lo, half)
    hi_v = _sel_scalar(bits, tab_ref, lo + half, half)
    return jnp.where(bits[level], hi_v, lo_v)


def _roll_up_masked(x, s, group_rows):
    """row r <- x[r+s], zeroed where r+s crosses a ``group_rows`` boundary."""
    rolled = jnp.concatenate(
        [x[s:], jnp.zeros((s, x.shape[1]), x.dtype)], axis=0
    )
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    g = group_rows.bit_length() - 1
    same = ((row + s) >> g) == (row >> g)
    return jnp.where(same, rolled, jnp.zeros_like(rolled))


def _ladder(d, sym_idx, valid, inv4_ref, pres_ref, cumle_ref, dd_ref,
            ML: int, full: bool = False):
    """Canonical ladder LUT on a byte array ``d`` (int32, 0..255).

    Returns ``(x, ln)`` — the left-aligned code word and its bit length
    (0 for out-of-alphabet bytes or ``sym_idx >= valid``).  Mirrors
    :func:`tpuhuff.kernels.encode.lut_canonical`.

    With ``ENC_COMBINED`` (and combined tables in the refs, ML <= 12) the
    per-symbol resolve is two 64-select trees over a pre-combined
    ``(acode12 << 4) | len`` entry instead of rank lookup + ladder.
    """
    bits_d = [((d >> (k + 2)) & 1) == 1 for k in range(6)]
    if ENC_COMBINED:
        lo_w = _sel_scalar(bits_d, inv4_ref, 0, 64).astype(jnp.uint32)
        hi_a = _sel_scalar(bits_d, cumle_ref, 0, 32)
        hi_b = _sel_scalar(bits_d, dd_ref, 0, 32)
        hi_w = jnp.where(bits_d[5], hi_b, hi_a).astype(jnp.uint32)
        sh = ((d & 3).astype(jnp.uint32) * 8)
        C = (((lo_w >> sh) & jnp.uint32(0xFF))
             | (((hi_w >> sh) & jnp.uint32(0xFF)) << 8))
        ln = (C & jnp.uint32(0xF)).astype(jnp.int32)
        # acode32 = val << (32 - len) = (val << (12 - len)) << 20 — a
        # STATIC shift; absent bytes have C = 0 -> ln 0, x 0 (membership
        # rides the table, no present-word tree)
        x = (C >> jnp.uint32(4)) << jnp.uint32(20)
        ln = jnp.where(sym_idx < valid, ln, 0)
        x = jnp.where(ln == 0, jnp.uint32(0), x)
        return x, ln
    word = _sel_scalar(bits_d, inv4_ref, 0, 64)
    sh = ((d & 3).astype(jnp.uint32) * 8)
    rank = ((word >> sh) & jnp.uint32(0xFF)).astype(jnp.int32)
    ln = jnp.ones(d.shape, jnp.int32)
    dlt = dd_ref[0, 0] + jnp.zeros(d.shape, jnp.int32)
    for L in range(1, ML):
        ind = (rank >= cumle_ref[0, L - 1]).astype(jnp.int32)
        ln = ln + ind
        dlt = dlt + ind * dd_ref[0, L]
    if full:
        ln = jnp.where(sym_idx < valid, ln, 0)
    else:
        wbits = [((d >> (k + 5)) & 1) == 1 for k in range(3)]
        pword = _sel_scalar(wbits, pres_ref, 0, 8)
        member = ((pword >> (d.astype(jnp.uint32) & 31)) & 1) == 1
        ln = jnp.where(member & (sym_idx < valid), ln, 0)
    x = jnp.where(
        ln == 0, jnp.uint32(0),
        (rank + dlt).astype(jnp.uint32)
        << ((jnp.uint32(32) - ln.astype(jnp.uint32)) & 31),
    )
    return x, ln


def _encode_kernel(data_ref, valid_ref, inv4_ref, pres_ref, cumle_ref,
                   dd_ref, words_ref, bits_ref, *, N: int, ML: int,
                   halved: bool, full: bool):
    d = data_ref[:]  # (rows, lanes) int32: one byte, or a packed pair
    rows, lanes = d.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    # flat layout passes a (1, lanes) valid row; cell-major replicates it to
    # 8 sublanes (TPU block shapes need sublanes divisible by 8) — row 0 is
    # the real data either way
    valid = valid_ref[0:1, :]

    if halved:
        # ---- fused LUT on both bytes + pair merge inside one u32 ----
        if _STACK_LADDER:
            # both byte planes through ONE stacked ladder pass: same element
            # math, half the instruction count on the dominant select-tree
            # LUT (Mosaic is instruction-overhead-bound here)
            d2 = jnp.concatenate([d & 0xFF, (d >> 8) & 0xFF], axis=0)
            row2 = jnp.concatenate([2 * row, 2 * row + 1], axis=0)
            xs, ls = _ladder(d2, row2, valid, inv4_ref, pres_ref,
                             cumle_ref, dd_ref, ML, full)
            x0, x1 = xs[:rows], xs[rows:]
            l0, l1 = ls[:rows], ls[rows:]
        else:
            x0, l0 = _ladder(d & 0xFF, 2 * row, valid, inv4_ref, pres_ref,
                             cumle_ref, dd_ref, ML, full)
            x1, l1 = _ladder((d >> 8) & 0xFF, 2 * row + 1, valid, inv4_ref,
                             pres_ref, cumle_ref, dd_ref, ML, full)
        x = x0 | (x1 >> l0.astype(jnp.uint32))  # l0 <= ML <= 16 < 32
        alen = l0 + l1
        W, gsyms = 1, 2
    else:
        x, alen = _ladder(d, row, valid, inv4_ref, pres_ref, cumle_ref,
                          dd_ref, ML, full)
        W, gsyms = 1, 1

    x, alen = _merge_levels(x, alen, N, ML, W, gsyms)
    words_ref[:] = x
    bits_ref[:] = jnp.broadcast_to(alen[0:1], bits_ref.shape)


def _encode_kernel_fused(*refs, N: int, ML: int, full: bool,
                         groups: int = 1, transpose_out: bool = False,
                         with_hist: bool = False):
    """Natural-input variant: the cell's bytes arrive as the raw stream
    (128 blocks x N/4 u32 little-endian words) and the packed-pair LAYOUT
    happens *inside* the kernel as four constant-permutation NT matmuls —
    no XLA transpose pass at all (r3 probes: the XLA pack/transpose was the
    size-superlinear cost, while the perm-dot runs at ~160 GB/s).

    ``pa/pb``: the two (N/2, N/4) halves of the perfect-shuffle matrix
    PI[r, src(r)] = 1, src(r) = (r>>1) + (N/4)*(r&1), as bfloat16 — one-hot
    rows select u32 halfwords exactly (byte values <= 255 are exact in
    bf16, single-term dot products, f32 accumulation).

    Also emits ``miss``: the per-cell count of valid bytes with no code
    (the reference's per-letter CompressError, `comp.rs:427-432`) — free
    here, replacing the separate ``count_missing`` device pass.

    ``transpose_out`` (r4, VERDICT r3 #1): emit the words in the CONTAINER
    row layout — an in-kernel (R, 128) -> (128, R) transpose per group via
    four byte-plane identity matmuls (one-hot sums are exact in bf16; MXU
    work that overlaps the VPU-bound ladder/merge), so the product pays
    ZERO XLA-side inverse-layout pass and the bench's consumed output IS
    the kernel's output.

    ``with_hist`` (r4, VERDICT r3 #2 / config 4's fused hist+encode
    pipeline): additionally accumulate a 256-bin histogram of a SECOND
    byte operand (the next chunk/shard's raw bytes) into a grouped
    (128, 128) int32 block — the G=8 form of the standalone Pallas
    histogram (8 element groups x 16x16 nibble bins, one int8 NT matmul
    per 256-row slab).  The MXU histogram rides the VPU-bound encode, so
    a fused pass costs ~max parts instead of their sum — the only way
    past the two-pass serial-composition limit on one core (VERDICT r3
    weak #3).  Finalize with :func:`finalize_hist8`.
    """
    n_in = 8 + (1 if transpose_out else 0) + (1 if with_hist else 0)
    ins, outs = refs[:n_in], refs[n_in:]
    (w_ref, valid_ref, pa_ref, pb_ref, inv4_ref, pres_ref, cumle_ref,
     dd_ref) = ins[:8]
    eye_ref = ins[8] if transpose_out else None
    hist_ref = ins[-1] if with_hist else None
    if with_hist:
        words_ref, bits_ref, miss_ref, hist_out_ref, acc_ref = outs
    else:
        words_ref, bits_ref, miss_ref = outs
    R = (words_ref.shape[1] if transpose_out
         else words_ref.shape[0] // groups)
    for g in range(groups):
        # (128, N/4) u32 slab: sublane = block lane, lane = word index
        w = w_ref[128 * g : 128 * (g + 1), :]
        dt = pa_ref.dtype
        u0 = (w & 0xFF).astype(jnp.int32).astype(dt)
        u1 = ((w >> 8) & 0xFF).astype(jnp.int32).astype(dt)
        u2 = ((w >> 16) & 0xFF).astype(jnp.int32).astype(dt)
        u3 = (w >> 24).astype(jnp.int32).astype(dt)
        nt = (((1,), (1,)), ((), ()))
        b0 = (jax.lax.dot_general(pa_ref[:], u0, nt,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(pb_ref[:], u2, nt,
                                    preferred_element_type=jnp.float32)
              ).astype(jnp.int32)
        b1 = (jax.lax.dot_general(pa_ref[:], u1, nt,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(pb_ref[:], u3, nt,
                                    preferred_element_type=jnp.float32)
              ).astype(jnp.int32)
        rows, lanes = b0.shape  # (N/2, 128)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
        valid = valid_ref[8 * g : 8 * g + 1, :]
        x0, l0 = _ladder(b0, 2 * row, valid, inv4_ref, pres_ref,
                         cumle_ref, dd_ref, ML, full)
        x1, l1 = _ladder(b1, 2 * row + 1, valid, inv4_ref, pres_ref,
                         cumle_ref, dd_ref, ML, full)
        miss = ((l0 == 0) & (2 * row < valid)).astype(jnp.int32) + (
            (l1 == 0) & (2 * row + 1 < valid)).astype(jnp.int32)
        miss_ref[8 * g : 8 * (g + 1), :] = jnp.broadcast_to(
            jnp.sum(miss, axis=0, keepdims=True), (8, lanes))
        x = x0 | (x1 >> l0.astype(jnp.uint32))
        alen = l0 + l1
        x, alen = _merge_levels(x, alen, N, ML, 1, 2)
        # a block's stream is <= ML*N bits, so only the first
        # ceil(ML*N/32) word rows can be nonzero — the out spec is
        # bounded to R rows (_fused_out_rows), saving up to ~45% of the
        # output HBM write
        if transpose_out:
            xr = x[:R]
            out_t = jnp.zeros((lanes, R), jnp.uint32)
            for k in range(4):
                pk = ((xr >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(
                    jnp.int32).astype(jnp.bfloat16)
                # contract the plane's row axis against the identity:
                # out[l, i] = sum_a pk[a, l] * I[a, i] = pk[i, l] — a pure
                # MXU transpose, exact (one-hot single-term bf16 sums)
                tk = jax.lax.dot_general(
                    pk, eye_ref[:], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32).astype(jnp.uint32)
                out_t = out_t | (tk << jnp.uint32(8 * k))
            words_ref[128 * g : 128 * (g + 1), :] = out_t
        else:
            words_ref[R * g : R * (g + 1), :] = x[:R]
        bits_ref[8 * g : 8 * (g + 1), :] = jnp.broadcast_to(
            alen[0:1], (8, lanes))

    if with_hist:
        i = pl.program_id(0)
        np_ = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        from .pallas_histogram import HIST_BF16, HIST_U8, hist_slab_update

        hrows = hist_ref.shape[0]  # groups * N rows of 128 bytes
        slab = min(256, hrows)  # hrows is a power of two >= 16
        for q in range(hrows // slab):
            hist_slab_update(hist_ref[slab * q : slab * (q + 1), :],
                             acc_ref, G=8, u8=HIST_U8, bf16cmp=HIST_BF16)

        @pl.when(i == np_ - 1)
        def _():
            hist_out_ref[:] = acc_ref[:]


def _fused_out_rows(N: int, ML: int) -> int:
    """Static word-row bound for the fused kernel's output block."""
    need = (ML * N + 31) // 32
    return min(N // 2, -(-need // 8) * 8)  # 8-sublane granularity


def _merge_levels(x, alen, N: int, ML: int, W: int, gsyms: int):
    """Doubling bit-merge levels with width-bounded shift trees."""
    rows, lanes = x.shape
    while gsyms < N:
        rowv = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
        is_b = ((rowv >> (W.bit_length() - 1)) & 1) == 1
        a_len = jnp.where(is_b, _roll_down(alen, W), alen)
        b_len = jnp.where(is_b, alen, _roll_up(alen, W))
        u = 32 * W - a_len  # bits to move the B half up by
        frame = jnp.where(is_b, x, jnp.uint32(0))
        bA = min(ML * gsyms, 32 * W)  # static bound on a_len
        qmin = (32 * W - bA) >> 5
        if qmin:
            frame = _roll_up_masked(frame, qmin, 2 * W)
        qrem = (u >> 5) - qmin  # in [0, W - qmin]
        qrange = W - qmin
        bit = 0
        s = 1
        while s <= qrange:
            rolled = _roll_up_masked(frame, s, 2 * W)
            frame = jnp.where(((qrem >> bit) & 1) == 1, rolled, frame)
            s *= 2
            bit += 1
        rb = (u & 31).astype(jnp.uint32)
        nxt = _roll_up_masked(frame, 1, 2 * W)
        frame = jnp.where(
            rb == 0, frame,
            (frame << rb) | (nxt >> ((jnp.uint32(32) - rb) & 31)),
        )
        x = jnp.where(is_b, jnp.uint32(0), x) | frame
        alen = a_len + b_len
        W *= 2
        gsyms *= 2
    return x, alen


# NOTE: the v3 hybrid encoder (XLA ladder LUT + a merge-only VMEM kernel,
# `encode_blocks_pallas3`) was removed: it was a documented negative result
# (the XLA ladder front alone measured 1.53 ms vs 1.60 ms for the whole v2
# kernel — PERF_NOTES.md round 2) and its merge-only pallas_call had rotted
# (undefined `lanes` in out_specs).  v2 below is the production kernel.


def _roll_up(x, s):
    return jnp.concatenate(
        [x[s:], jnp.zeros((s, x.shape[1]), x.dtype)], axis=0
    )


def _roll_down(x, s):
    return jnp.concatenate(
        [jnp.zeros((s, x.shape[1]), x.dtype), x[:-s]], axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_syms", "max_len", "halved", "interpret", "full"),
)
def _encode_call(data_t, valid_t, inv4, pres, cumle, dd, n_syms, max_len,
                 halved, interpret, full=False):
    """Flat layout: operands are (rows, B) with blocks across the lane dim.

    Each grid cell's tile is a strided column slab of the global array;
    kept for A/B measurement (``TPUHUFF_ENC_CELL=0``) — the cell-major
    variant below is the production path."""
    rows, B = data_t.shape
    lanes = CELL_LANES if B % CELL_LANES == 0 else LANES
    kernel = functools.partial(
        _encode_kernel, N=n_syms, ML=max_len, halved=halved, full=full
    )
    return pl.pallas_call(
        kernel,
        grid=(B // lanes,),
        in_specs=[
            pl.BlockSpec((rows, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, B), jnp.uint32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(data_t, valid_t, inv4, pres, cumle, dd)


def fused_layout_ok(N: int, max_len: int) -> bool:
    """True when :func:`encode_blocks_pallas2` will take the fused-input
    (raw-stream, in-kernel layout) route for these static parameters.

    ``N >= 16``: at N = 8 the ``min(N//2, ...)`` clamp in
    :func:`_fused_out_rows` can yield R = 4, violating the TPU sublane
    tiling rule (block sublane dim must divide by 8) on hardware only —
    interpret-mode tests cannot catch it (ADVICE r3)."""
    halved = 2 * max_len <= 32 and N >= 2
    return ENC_LAYOUT == "fused" and halved and N % 4 == 0 and N >= 16


@functools.lru_cache(maxsize=16)
def _perm_halves_np(n_words: int):
    """(2*n_words, n_words) halves of the perfect-shuffle matrix: the byte
    plane of pair row r comes from word src(r) = (r>>1) + n_words*(r&1)."""
    r = np.arange(2 * n_words)
    src = (r >> 1) + n_words * (r & 1)
    pi = np.zeros((2 * n_words, 2 * n_words), np.float32)
    pi[r, src] = 1.0
    return pi[:, :n_words], pi[:, n_words:]


@functools.partial(
    jax.jit, static_argnames=("n_syms", "max_len", "interpret", "full",
                              "transpose_out", "with_hist", "groups"),
)
def _encode_call_fused(words_nat, valid_g, inv4, pres, cumle, dd, n_syms,
                       max_len, interpret, full, transpose_out=False,
                       hist_bytes=None, with_hist=False,
                       groups: int | None = None):
    """Fused-input path: ``words_nat`` (cells*128, N/4) u32 is the raw byte
    stream (pure bitcast+reshape — zero XLA layout work); each grid cell
    reads its 128 blocks' natural words and performs the pair layout
    in-kernel via the perm matmuls (see ``_encode_kernel_fused``).

    ``transpose_out``: words come back as (B, R) container rows (in-kernel
    MXU transpose) instead of cell-major (cells*R, 128).
    ``hist_bytes`` (with ``with_hist``): (cells*G*N, 128) u8 raw bytes of
    the NEXT chunk; a grouped (128, 128) i32 histogram block rides the
    call (finalize with :func:`finalize_hist8`)."""
    N = n_syms
    nw = N // 4
    rows = N // 2
    R = _fused_out_rows(N, max_len)
    G = _enc_groups() if groups is None else groups
    total = words_nat.shape[0] // 128
    while total % G:
        G //= 2
    cells = total // G
    pa, pb = _perm_halves_np(nw)
    kernel = functools.partial(
        _encode_kernel_fused, N=N, ML=max_len, full=full, groups=G,
        transpose_out=transpose_out, with_hist=with_hist,
    )
    in_specs = [
        pl.BlockSpec((128 * G, nw), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8 * G, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, nw), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, nw), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [words_nat, valid_g,
                jnp.asarray(pa, jnp.bfloat16), jnp.asarray(pb, jnp.bfloat16),
                inv4, pres, cumle, dd]
    if transpose_out:
        in_specs.append(pl.BlockSpec((R, R), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(np.eye(R, dtype=np.float32),
                                    jnp.bfloat16))
        words_spec = pl.BlockSpec((128 * G, R), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        words_shape = jax.ShapeDtypeStruct((cells * G * 128, R), jnp.uint32)
    else:
        words_spec = pl.BlockSpec((R * G, LANES), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        words_shape = jax.ShapeDtypeStruct((cells * G * R, LANES),
                                           jnp.uint32)
    out_specs = [
        words_spec,
        pl.BlockSpec((8 * G, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8 * G, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        words_shape,
        jax.ShapeDtypeStruct((cells * G * 8, LANES), jnp.int32),
        jax.ShapeDtypeStruct((cells * G * 8, LANES), jnp.int32),
    ]
    scratch_shapes = []
    if with_hist:
        in_specs.append(pl.BlockSpec((G * N, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(hist_bytes)
        out_specs.append(pl.BlockSpec((128, 128), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((128, 128), jnp.int32))
        scratch_shapes = [pltpu.VMEM((128, 128), jnp.int32)]
    return pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*operands)


def finalize_hist8(C: jnp.ndarray) -> jnp.ndarray:
    """Grouped (128, 128) hist block -> (256,) counts (the G=8 form of
    :func:`tpuhuff.kernels.pallas_histogram._finalize`, to which this
    delegates — one copy of the grouped-accumulator decode rule)."""
    from .pallas_histogram import _finalize

    return _finalize(C)


def _enc_groups() -> int:
    """Block-lane groups per fused-kernel grid cell (power of two),
    resolved at import (``TPUHUFF_ENC_GROUPS``; see ``_resolve_groups``
    for the measured G sweep)."""
    return ENC_GROUPS


@functools.partial(
    jax.jit,
    static_argnames=("n_syms", "max_len", "halved", "interpret", "full",
                     "lanes"),
)
def _encode_call_cells(data_g, valid_g, inv4, pres, cumle, dd, n_syms,
                       max_len, halved, interpret, full, lanes):
    """Cell-major layout: operands are (cells*rows, lanes) with each grid
    cell's tile CONTIGUOUS in HBM (row index ``i*rows..``), mirroring the
    decode kernel's layout.

    The flat layout's per-cell tiles are strided column slabs of a
    (rows, B) array whose stride grows with B — both the XLA transpose
    producing it and the per-cell DMA degrade superlinearly beyond ~16 MiB
    (PERF_NOTES r2 "Size scaling": encode e2e 8.2 -> 6.9 GB/s at 64 MiB
    while the kernel stays near-linear).  Cell-major keeps every layout
    transform a batched fixed-shape (lanes, rows) transpose and every DMA
    contiguous, so throughput is size-invariant (VERDICT r2 next #1)."""
    cells = valid_g.shape[0] // 8
    rows = data_g.shape[0] // cells
    kernel = functools.partial(
        _encode_kernel, N=n_syms, ML=max_len, halved=halved, full=full
    )
    # per-cell (1, lanes) blocks violate the TPU tiling rule (sublane block
    # dim must divide by 8 or equal the array dim), so the valid row arrives
    # replicated to 8 sublanes and the bits output writes an (8, lanes)
    # block whose rows are all copies — callers read row 0
    return pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cells * rows, lanes), jnp.uint32),
            jax.ShapeDtypeStruct((cells * 8, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(data_g, valid_g, inv4, pres, cumle, dd)


def _pack_pairs_2d(data: jnp.ndarray) -> jnp.ndarray:
    """(B, N) uint8 -> (B, N/2) int32 with ``sym(2r) | sym(2r+1) << 8``.

    u32 bitcast + halfword split instead of u8 strided slices: the byte
    quads load as one little-endian word (``b0 | b1<<8 | b2<<16 | b3<<24``),
    whose low/high halves ARE the two packed pairs — no sub-u32 strided
    access, ~2x less layout traffic.
    """
    B, N = data.shape
    if N % 4:
        d = data.astype(jnp.int32)
        return d[:, 0::2] | (d[:, 1::2] << 8)
    w = jax.lax.bitcast_convert_type(
        data.reshape(B, N // 4, 4), jnp.uint32
    )
    pairs = jnp.stack([w & 0xFFFF, w >> 16], axis=-1).reshape(B, N // 2)
    return pairs.astype(jnp.int32)


def pack_pairs(data: jnp.ndarray) -> jnp.ndarray:
    """(B, N) uint8 -> (N/2, B) int32 packed pairs (flat kernel layout).

    Runs in XLA (strided slices are native there; inside Mosaic they lower
    to an unsupported gather) — this is the kernel-input layout transform
    for the flat path.  The global (B, N/2) -> (N/2, B) transpose here is
    what degrades superlinearly with B; the cell-major path uses
    :func:`_to_cells` instead.
    """
    return _pack_pairs_2d(data).T


def _to_cells(x2d: jnp.ndarray, lanes: int) -> jnp.ndarray:
    """(B, rows) -> (cells*rows, lanes): batched fixed-shape transposes.

    Cell c's tile occupies rows ``c*rows..(c+1)*rows`` — contiguous in HBM,
    matching ``_encode_call_cells``'s index map.  Every transpose is a
    (lanes, rows) tile, so XLA's transpose tiling cost is size-invariant.
    """
    B, rows = x2d.shape
    cells = B // lanes
    return (
        x2d.reshape(cells, lanes, rows)
        .transpose(0, 2, 1)
        .reshape(cells * rows, lanes)
    )


def _from_cells(x_g: jnp.ndarray, rows: int, lanes: int) -> jnp.ndarray:
    """Inverse of :func:`_to_cells`: (cells*rows, lanes) -> (B, rows)."""
    cells = x_g.shape[0] // rows
    return (
        x_g.reshape(cells, rows, lanes)
        .transpose(0, 2, 1)
        .reshape(cells * lanes, rows)
    )


def encode_blocks_pallas2(
    data: jnp.ndarray,
    canon_tables,
    max_len: int,
    valid_lens: jnp.ndarray | None = None,
    interpret: bool = False,
    full_alphabet: bool = False,
    with_miss: bool = False,
    hist_data: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, ...]:
    """Encode (B, N) uint8 blocks with the fused canonical Pallas kernel.

    ``canon_tables`` = the four arrays from
    :func:`tpuhuff.kernels.encode.make_canonical_encode_tables` (invperm4,
    present, cumle, dd); ``max_len`` their static ladder bound.  Returns
    ``(words (B, W) u32, bits (B,) i32)`` — bit-identical to
    :func:`tpuhuff.kernels.encode.encode_blocks`.

    Layouts (``TPUHUFF_ENC_LAYOUT``): ``fused`` (default — raw-stream
    input, pair layout done in-kernel by perm matmuls; requires the halved
    pair-merge mode), ``cell`` / ``flat`` (XLA-side layout; A/B baselines).
    ``with_miss=True`` (fused layout only) additionally returns the total
    count of valid input bytes with no code — the encode-time analogue of
    :func:`tpuhuff.kernels.encode.count_missing` at zero extra passes.
    ``hist_data`` (fused layout only): a uint8 array of at most the padded
    input's byte count (B_padded * N) — typically the NEXT chunk/shard's
    raw bytes; its exact (256,) int32 histogram is appended to the
    returned tuple, computed by MXU matmuls that overlap the VPU-bound
    encode (config 4's fused histogram+encode pipeline).  Internal zero
    padding is subtracted from bin 0 automatically."""
    if data.ndim == 1:
        data = data[None, :]
    B, N = data.shape
    assert N & (N - 1) == 0
    Bp = -(-B // LANES) * LANES
    if Bp != B:
        data = jnp.pad(data, ((0, Bp - B), (0, 0)))
        if valid_lens is not None:
            valid_lens = jnp.pad(valid_lens, (0, Bp - B))
        else:
            valid_lens = jnp.concatenate(
                [jnp.full(B, N, jnp.int32), jnp.zeros(Bp - B, jnp.int32)]
            )
    inv4, pres, cumle, dd = canon_tables
    halved = 2 * max_len <= 32 and N >= 2
    inv4 = jnp.asarray(inv4, jnp.uint32).reshape(1, 64)
    pres = jnp.asarray(pres, jnp.uint32).reshape(1, 8)
    # .size is static even on tracers (encode_blocks calls this inside jit)
    cumle32 = jnp.zeros((1, 32), jnp.int32).at[0, : cumle.size].set(
        jnp.asarray(cumle, jnp.int32))
    dd32 = jnp.zeros((1, 32), jnp.int32).at[0, : dd.size].set(
        jnp.asarray(dd, jnp.int32))
    valid_row = (jnp.full(Bp, N, jnp.int32) if valid_lens is None
                 else valid_lens.astype(jnp.int32))
    layout = ENC_LAYOUT
    fused_ok = fused_layout_ok(N, max_len)
    if with_miss and not fused_ok:
        raise ValueError("with_miss requires the fused layout (pair mode)")
    if hist_data is not None and not fused_ok:
        raise ValueError("hist_data requires the fused layout (pair mode)")
    if fused_ok:
        # production: raw-stream input, layout fused into the kernel
        rows = N // 2
        cells = Bp // LANES
        words_nat = jax.lax.bitcast_convert_type(
            data.reshape(Bp, N // 4, 4), jnp.uint32
        )  # (Bp, N/4) little-endian words — layout-identity with the bytes
        valid_g = jnp.broadcast_to(
            valid_row.reshape(cells, 1, LANES), (cells, 8, LANES)
        ).reshape(cells * 8, LANES)
        tout = ENC_TOUT
        with_hist = hist_data is not None
        hist_bytes = None
        hist_pad = 0
        if with_hist:
            hist_flat = hist_data.reshape(-1)
            assert hist_flat.shape[0] <= Bp * N, (
                "hist_data exceeds the cell byte count", hist_flat.shape)
            hist_pad = Bp * N - hist_flat.shape[0]
            if hist_pad:
                hist_flat = jnp.pad(hist_flat, (0, hist_pad))
            hist_bytes = hist_flat.reshape(Bp * N // 128, 128)
        out = _encode_call_fused(
            words_nat, valid_g, inv4, pres, cumle32, dd32, int(N),
            int(max_len), bool(interpret), bool(full_alphabet),
            transpose_out=tout, hist_bytes=hist_bytes, with_hist=with_hist,
            groups=_enc_groups())
        words_g, bits_g, miss_g = out[:3]
        bits = bits_g.reshape(cells, 8, LANES)[:, 0, :].reshape(Bp)
        R = _fused_out_rows(N, int(max_len))
        words = (words_g[:B] if tout
                 else _from_cells(words_g, R, LANES)[:B])
        res = [words, bits[:B]]
        if with_miss:
            res.append(jnp.sum(miss_g.reshape(cells, 8, LANES)[:, 0, :]))
        if with_hist:
            hist = finalize_hist8(out[3])
            if hist_pad:
                hist = hist.at[0].add(-hist_pad)
            res.append(hist)
        return tuple(res)
    if layout == "cell":
        # cell-major XLA layout — kept for A/B (slower than flat, r3 s1)
        lanes = CELL_LANES if Bp % CELL_LANES == 0 else LANES
        rows = N // 2 if halved else N
        pairs = (_pack_pairs_2d(data) if halved
                 else data.astype(jnp.int32))
        data_g = _to_cells(pairs, lanes)
        cells = Bp // lanes
        valid_g = jnp.broadcast_to(
            valid_row.reshape(cells, 1, lanes), (cells, 8, lanes)
        ).reshape(cells * 8, lanes)
        words_g, bits_g = _encode_call_cells(
            data_g, valid_g, inv4, pres, cumle32, dd32, int(N),
            int(max_len), halved, bool(interpret), bool(full_alphabet),
            int(lanes))
        bits = bits_g.reshape(cells, 8, lanes)[:, 0, :].reshape(Bp)
        return _from_cells(words_g, rows, lanes)[:B], bits[:B]
    data_t = pack_pairs(data) if halved else data.T.astype(jnp.int32)
    words_t, bits_t = _encode_call(data_t, valid_row[None, :], inv4, pres,
                                   cumle32, dd32, int(N), int(max_len),
                                   halved, bool(interpret),
                                   bool(full_alphabet))
    return words_t.T[:B], bits_t[0, :B]

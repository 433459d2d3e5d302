"""Pallas TPU kernel: 256-bin byte histogram with VMEM-resident one-hots.

The XLA nibble-matmul histogram (:mod:`tpuhuff.kernels.histogram`)
materializes its one-hot dot operands in HBM — dot operands don't fuse —
so it runs at HBM-materialization speed (~13 GB/s effective inside a
fused program at 100 MiB).  This kernel keeps everything in VMEM and
rides the MXU with a *grouped* one-hot formulation (r3 probes: 21.5-24.8
GB/s at 100 MiB/16 MiB):

* per grid cell, 128 KiB of bytes arrive as a (1024, 128) **uint8** tile —
  a pure ``reshape`` of the raw stream.  The kernel takes u8 directly:
  routing the bytes through a ``bitcast`` to u32 first (via a flat
  ``(n/4, 4)`` or ``(m, 128, 4)`` intermediate) poisons the XLA layout
  and drops throughput to 2.4 GB/s (r3 session 5 A/B);
* each 256-row quarter of the tile is reshaped (lane-concat) to
  (16, 2048) and tiled 16x along sublanes to (256, 2048): sublane
  ``16*k + g`` holds element group ``g``'s bytes, ``k`` is the bin
  index — the one-hot compare against ``iota >> 4`` builds 16 groups x
  16 nibble bins;
* one **int8** NT matmul per quarter (int32 accumulation — exact at any
  size, and 2x the bf16 K-rate: 32.7 vs 21.5 GB/s at 100 MiB, r3 s6)
  contracts the 2048 element lanes: ``C[16k+g, 16k'+g']`` counts
  ``hi==k & lo==k'`` within group ``g`` at ``g == g'`` — the M=N=256
  output spans 4 MXU tiles, diagonal blocks extracted once at the end
  (:func:`_finalize`).  ``TPUHUFF_HIST_DOT=bf16`` selects the bf16 dot
  (with per-cell i32 spill) as a fallback for backends without int8 MXU.

NOTE: ``jnp.concatenate([s16] * 16)`` is deliberate — ``pltpu.repeat``
produces the same values but forces a pathological operand relayout in
front of the MXU (measured 2.4 GB/s vs 24.8; r3 session 3/4 probes).

Reference analogue: the 12-thread host histogram
`/root/reference/huff_coding/src/weights.rs:293-319`; this is its
single-chip device form, merged across chips with ``psum`` (dist/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["histogram_pallas", "PALLAS_HIST_MIN_BYTES"]

ROWS = 256                      # u8 rows per quarter-slab
U8_ROWS = ROWS * 4              # u8 tile rows per cell
CELL_BYTES = U8_ROWS * 128      # 128 KiB

# below this, padding waste and grid overhead beat the kernel — use XLA
PALLAS_HIST_MIN_BYTES = 1 << 20

import os as _os

# element groups G (16G x 16G accumulator).  MXU passes per slab scale as
# max(16G/128, 1)^2 * K with K = slab/G: G=8 packs the 8 groups x 16x16
# nibble bins into EXACTLY one 128x128 MXU tile — half the MXU time of the
# r3 G=16 (256x256 = 4 tiles) form at identical VPU compare cost (r4
# probe s1: 2.62 ms vs 3.15 ms per 100 MiB -> 40.1 GB/s).  Resolved at
# import; TPUHUFF_HIST_G=16 restores the old form for A/B.
HIST_G = 8 if _os.environ.get("TPUHUFF_HIST_G", "8") != "16" else 16
# build the one-hot compares in the uint8 domain (4x VPU lane density on
# the compare-bound part) instead of int32.  NEGATIVE RESULT on this
# backend: Mosaic rejects BOTH i8-vector shifts (arith.shrui, r4 s2) and
# i8-vector compares (arith.cmpi on vector<...xi8>, r4 s3), so the u8
# route cannot compile on hardware — default OFF; the code path is kept
# (interpret-verified) for backends that grow i8 VPU support.
HIST_U8 = _os.environ.get("TPUHUFF_HIST_U8", "0") == "1"
# build the compares in bfloat16 (2x VPU lane density vs i32; byte values
# and their /16 quotients are exact in bf16's 8 significand bits).
# NEGATIVE RESULT on this backend: Mosaic rejects bf16 VECTOR compares
# too (arith.cmpf on vector<...xbf16>, r4 s6) — alongside the i8 shift
# and i8 compare rejections, sub-32-bit VPU compare density is simply
# unavailable here.  Default OFF; interpret-verified path kept.
HIST_BF16 = _os.environ.get("TPUHUFF_HIST_BF16", "0") == "1"


def hist_slab_update(p_raw, acc_ref, *, G: int, u8: bool = False,
                     bf16cmp: bool = False, i8: bool = True) -> None:
    """Accumulate one (rows, 128) u8 slab into the grouped (16G, 16G)
    int32 accumulator ref — the ONE copy of the grouped one-hot histogram
    body, shared by the standalone kernel below and the fused
    encode+hist kernel (`pallas_encode2._encode_kernel_fused`)."""
    rows = p_raw.shape[0]
    T = rows * 128 // G
    dt = (jnp.uint8 if u8 else
          jnp.bfloat16 if bf16cmp else jnp.int32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (16 * G, T), 0)
    binv_i = sub >> (G.bit_length() - 1)
    binv = binv_i.astype(dt)
    # u8 mode compares the UNSHIFTED high nibble against pre-shifted bin
    # values: Mosaic rejects shifts on i8 vectors (arith.shrui, r4 s2)
    # but accepts bitwise AND and compares at the 4x i8 lane density
    binv_hi = (binv_i << 4).astype(dt)
    # Mosaic has no direct u8->bf16 cast — hop through i32 (r4 s5)
    p = (p_raw.astype(jnp.int32).astype(dt) if bf16cmp
         else p_raw.astype(dt))
    sG = jnp.concatenate(
        [p[G * k : G * (k + 1)] for k in range(rows // G)], axis=1
    )  # (G, T)
    r = jnp.concatenate([sG] * 16, axis=0)  # (16G, T) tile-stacked
    if u8:
        hi = (r & jnp.uint8(0xF0)) == binv_hi
        lo = (r & jnp.uint8(0x0F)) == binv
    elif bf16cmp:
        # nibble split without integer ops: r/16 is a power-of-two
        # scale (exact), floor recovers the hi nibble, the remainder
        # the lo nibble — all values <= 255 exact in bf16
        hi_f = jnp.floor(r * jnp.bfloat16(1.0 / 16.0))
        lo_f = r - hi_f * jnp.bfloat16(16.0)
        hi = hi_f == binv
        lo = lo_f == binv
    else:
        hi = (r >> 4) == binv
        lo = (r & 15) == binv
    if i8:
        # int8 operands + int32 accumulation: 2x the bf16 MXU K-rate
        # (r3 s6: 3.21 ms vs 4.88 ms per 100 MiB) and exact at any
        # size with no f32 spill.  NOTE preferred_element_type must
        # be int32 — int8 operands with f32 accumulation crash this
        # backend's remote compiler (r3 s2).
        acc_ref[:] += jax.lax.dot_general(
            hi.astype(jnp.int8), lo.astype(jnp.int8),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        # f32 accumulation of one cell is exact (<= 2^17 per entry);
        # the i32 accumulator absorbs it every cell
        acc_ref[:] += jax.lax.dot_general(
            hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)


def _hist_kernel(w_ref, o_ref, acci_ref, *, i8: bool, G: int, u8: bool,
                 bf16cmp: bool = False):
    i = pl.program_id(0)
    np_ = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acci_ref[:] = jnp.zeros_like(acci_ref)

    for q in range(4):
        hist_slab_update(w_ref[ROWS * q : ROWS * (q + 1), :], acci_ref,
                         G=G, u8=u8, bf16cmp=bf16cmp, i8=i8)

    @pl.when(i == np_ - 1)
    def _():
        o_ref[:] = acci_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "G", "u8",
                                              "bf16cmp"))
def _hist_call(bytes2d: jnp.ndarray, interpret: bool = False,
               G: int | None = None, u8: bool | None = None,
               bf16cmp: bool | None = None) -> jnp.ndarray:
    cells = bytes2d.shape[0] // U8_ROWS
    i8 = _os.environ.get("TPUHUFF_HIST_DOT", "i8") != "bf16"
    if G is None:
        G = HIST_G
    if u8 is None:
        u8 = HIST_U8
    if bf16cmp is None:
        bf16cmp = HIST_BF16 and not u8
    return pl.pallas_call(
        functools.partial(_hist_kernel, i8=i8, G=G, u8=u8, bf16cmp=bf16cmp),
        grid=(cells,),
        in_specs=[pl.BlockSpec((U8_ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16 * G, 16 * G), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16 * G, 16 * G), jnp.int32),
        scratch_shapes=[pltpu.VMEM((16 * G, 16 * G), jnp.int32)],
        interpret=interpret,
    )(bytes2d)


def _finalize(C: jnp.ndarray) -> jnp.ndarray:
    """(16G, 16G) grouped-block accumulator -> (256,) counts.

    Row ``Gk+g``, col ``Gk'+g'`` is nonzero only at ``g == g'`` (same
    element group); ``hist[16k+k'] = sum_g C[Gk+g, Gk'+g]``.
    """
    G = C.shape[0] // 16
    C4 = C.reshape(16, G, 16, G)
    return jnp.einsum("kgjg->kj", C4).reshape(256)


@functools.partial(jax.jit, static_argnames=("interpret", "G", "u8",
                                              "bf16cmp"))
def histogram_pallas(data: jnp.ndarray,
                     interpret: bool = False,
                     G: int | None = None,
                     u8: bool | None = None,
                     bf16cmp: bool | None = None) -> jnp.ndarray:
    """(..., n) uint8 -> (256,) int32 exact histogram (TPU Pallas).

    Pads the stream with zero bytes up to a whole number of 128 KiB cells
    and subtracts the padding from bin 0.  Callers below
    ``PALLAS_HIST_MIN_BYTES`` should use the XLA path instead (the
    dispatcher in :mod:`tpuhuff.kernels.histogram` does).
    """
    flat = data.reshape(-1)
    n = flat.shape[0]
    padded_n = -(-max(n, 1) // CELL_BYTES) * CELL_BYTES
    if padded_n != n:
        flat = jnp.pad(flat, (0, padded_n - n))
    hist = _finalize(_hist_call(flat.reshape(-1, 128), interpret, G, u8,
                                bf16cmp))
    if padded_n != n:
        hist = hist.at[0].add(-(padded_n - n))
    return hist.astype(jnp.int32)

"""Pallas TPU kernel: 256-bin byte histogram with VMEM-resident one-hots.

The XLA nibble-matmul histogram (:mod:`tpuhuff.kernels.histogram`)
materializes its one-hot dot operands in HBM — dot operands don't fuse —
so it runs at HBM-materialization speed (~4 ms / 16 MiB standalone, ~11
GB/s effective inside a fused program).  This kernel keeps everything in
VMEM and rides the MXU with a *grouped* one-hot formulation (r3 probes:
24.8 GB/s, 2-6x the XLA path):

* per grid cell, 128 KiB of bytes arrive as a (256, 128) u32 tile —
  a pure ``bitcast`` + ``reshape`` of the raw stream, zero layout cost;
* each of the 4 byte planes is reshaped (lane-concat) to (16, 2048) and
  tiled 16x along sublanes to (256, 2048): sublane ``16*k + g`` holds
  element group ``g``'s bytes, ``k`` is the bin index — so the one-hot
  compare against ``iota >> 4`` builds 16 groups x 16 nibble bins;
* one bf16 NT matmul per plane contracts the 2048 element lanes:
  ``C[16k+g, 16k'+g']`` counts ``hi==k & lo==k'`` within group ``g`` at
  ``g == g'`` — 16 elements per MXU K-slice, diagonal blocks extracted
  once at the end (:func:`_finalize`);
* the f32 accumulator is exact below 2^24 per entry; it is flushed into
  an int32 accumulator every 64 cells (8 MiB), so arbitrarily large
  inputs stay exact.

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["histogram_pallas", "PALLAS_HIST_MIN_BYTES"]

ROWS = 256                      # u32 rows per cell tile
CELL_BYTES = ROWS * 128 * 4     # 128 KiB
_FLUSH_CELLS = 64               # f32 -> i32 flush period (8 MiB of bytes)

# below this, padding waste and grid overhead beat the kernel — use XLA
PALLAS_HIST_MIN_BYTES = 1 << 20


def _hist_kernel(w_ref, o_ref, accf_ref, acci_ref):
    i = pl.program_id(0)
    np_ = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        accf_ref[:] = jnp.zeros_like(accf_ref)
        acci_ref[:] = jnp.zeros_like(acci_ref)

    w = w_ref[:]  # (ROWS, 128) u32
    T = ROWS * 8
    sub = jax.lax.broadcasted_iota(jnp.int32, (256, T), 0)
    binv = sub >> 4
    for shift in (0, 8, 16, 24):
        p = ((w >> shift) & 0xFF).astype(jnp.int32)
        s16 = jnp.concatenate(
            [p[16 * k : 16 * (k + 1)] for k in range(ROWS // 16)], axis=1
        )  # (16, T)
        r = jnp.concatenate([s16] * 16, axis=0)  # (256, T) tile-stacked
        a = ((r >> 4) == binv).astype(jnp.bfloat16)
        b = ((r & 15) == binv).astype(jnp.bfloat16)
        accf_ref[:] += jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # keep the f32 accumulator's entries below 2^24: spill to int32
    @pl.when(jnp.logical_or(i % _FLUSH_CELLS == _FLUSH_CELLS - 1,
                            i == np_ - 1))
    def _():
        acci_ref[:] += accf_ref[:].astype(jnp.int32)
        accf_ref[:] = jnp.zeros_like(accf_ref)

    @pl.when(i == np_ - 1)
    def _():
        o_ref[:] = acci_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hist_call(words: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    cells = words.shape[0] // ROWS
    return pl.pallas_call(
        _hist_kernel,
        grid=(cells,),
        in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
        scratch_shapes=[pltpu.VMEM((256, 256), jnp.float32),
                        pltpu.VMEM((256, 256), jnp.int32)],
        interpret=interpret,
    )(words)


def _finalize(C: jnp.ndarray) -> jnp.ndarray:
    """(256,256) grouped-block accumulator -> (256,) counts.

    Row ``16k+g``, col ``16k'+g'`` is nonzero only at ``g == g'`` (same
    element group); ``hist[16k+k'] = sum_g C[16k+g, 16k'+g]``.
    """
    C4 = C.reshape(16, 16, 16, 16)
    return jnp.einsum("kgjg->kj", C4).reshape(256)


@functools.partial(jax.jit, static_argnames=("interpret",))
def histogram_pallas(data: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
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
    words = jax.lax.bitcast_convert_type(
        flat.reshape(padded_n // 4, 4), jnp.uint32
    ).reshape(-1, 128)
    hist = _finalize(_hist_call(words, interpret))
    if padded_n != n:
        hist = hist.at[0].add(-(padded_n - n))
    return hist.astype(jnp.int32)

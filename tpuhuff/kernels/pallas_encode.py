"""Pallas TPU kernel: VMEM-resident doubling bit-merge pack.

The XLA version (:mod:`tpuhuff.kernels.encode`) materializes every merge
level in HBM (~30+ passes over 4 bytes/symbol).  This kernel keeps the whole
merge in VMEM: HBM traffic is one read of the symbol tables and one write of
the packed words.

Layout (all 2-D — the Mosaic backend here rejects 3-D pads and dynamic
gathers): lanes = 128 independent blocks, sublanes = the block's N words.
At level k, group ``g`` of ``W = 2**k`` words occupies rows
``[g*W, (g+1)*W)``; merging adjacent groups shifts the odd ("B") group's
bits up to bit offset ``len(A)`` with a per-row select tree over the word
shift and an elementwise carry shift — static rolls (pad+slice), ``where``,
shifts only.

Feed it with ``acodes``/``lens`` from :func:`make_encode_tables` lookups;
output is per-block packed words + exact bit lengths, identical to
:func:`tpuhuff.kernels.encode.encode_blocks`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pack_blocks_pallas", "merge_pack_kernel"]

LANES = 128


def _roll_up(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """row r <- x[r + s], zero-fill at the bottom (static shift)."""
    if s == 0:
        return x
    pad = jnp.zeros((s, x.shape[1]), x.dtype)
    return jnp.concatenate([x[s:], pad], axis=0)


def _roll_down(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """row r <- x[r - s], zero-fill at the top (static shift)."""
    if s == 0:
        return x
    pad = jnp.zeros((s, x.shape[1]), x.dtype)
    return jnp.concatenate([pad, x[:-s]], axis=0)


def merge_pack_kernel(acodes_ref, lens_ref, words_ref, bits_ref):
    """Pack N symbols per lane into a bitstream (N = rows, power of two)."""
    N = acodes_ref.shape[0]
    levels = int(np.log2(N))
    assert 1 << levels == N

    row = jax.lax.broadcasted_iota(jnp.int32, (N, LANES), 0)
    x = acodes_ref[:]
    alen = lens_ref[:]

    for k in range(levels):
        W = 1 << k
        is_b = ((row >> k) & 1) == 1
        # bit-length of the A (even) part, broadcast to every row of the pair
        a_len = jnp.where(is_b, _roll_down(alen, W), alen)
        b_len = jnp.where(is_b, alen, _roll_up(alen, W))
        u = 32 * W - a_len  # bits to move the B part up by
        qw = (u >> 5).astype(jnp.int32)
        rb = (u & 31).astype(jnp.uint32)
        # frame holding only B bits (already at rows [W, 2W) of the pair)
        frame = jnp.where(is_b, x, jnp.uint32(0))
        # word-granularity shift: select tree over the bits of qw (qw <= W)
        for bit in range(k + 1):
            s = 1 << bit
            rolled = _roll_up(frame, s)
            same = ((row + s) >> (k + 1)) == (row >> (k + 1))
            rolled = jnp.where(same, rolled, jnp.uint32(0))
            frame = jnp.where(((qw >> bit) & 1) == 1, rolled, frame)
        # bit-granularity shift with carry from the next row
        nxt = _roll_up(frame, 1)
        same1 = ((row + 1) >> (k + 1)) == (row >> (k + 1))
        nxt = jnp.where(same1, nxt, jnp.uint32(0))
        shifted = jnp.where(
            rb == 0,
            frame,
            (frame << rb) | (nxt >> ((jnp.uint32(32) - rb) & 31)),
        )
        x = jnp.where(is_b, jnp.uint32(0), x) | shifted
        alen = a_len + b_len

    words_ref[:] = x
    bits_ref[:] = alen[0:1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_blocks_pallas(
    acodes: jnp.ndarray, lens: jnp.ndarray, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack symbol streams laid out as (N, B): N symbols x B blocks.

    ``acodes`` (N, B) uint32 left-aligned codewords, ``lens`` (N, B) int32
    (0 = padding symbol).  B must be a multiple of 128.  Returns
    ``(words (N, B) uint32, bits (1, B) int32)``.
    """
    N, B = acodes.shape
    assert B % LANES == 0, "block count must be a multiple of 128"
    grid = (B // LANES,)
    return pl.pallas_call(
        merge_pack_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B), jnp.uint32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(acodes, lens)


def encode_blocks_pallas(
    data: jnp.ndarray,
    lens_lut: jnp.ndarray,
    acodes_lut: jnp.ndarray,
    valid_lens: jnp.ndarray | None = None,
    interpret: bool = False,
    gather_free: bool | None = None,
    max_code_len: int | None = None,  # accepted for signature parity; the
    # VMEM kernel's temporaries never touch HBM so the bound buys nothing
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in variant of :func:`tpuhuff.kernels.encode.encode_blocks` that
    runs the merge in the Pallas kernel.  ``data`` (B, N) uint8; B padded to
    a multiple of 128 internally (extra blocks report 0 bits)."""
    from .encode import _auto_gather_free, _lut_lookup

    if data.ndim == 1:
        data = data[None, :]
    B, N = data.shape
    Bp = -(-B // LANES) * LANES
    if Bp != B:
        data = jnp.pad(data, ((0, Bp - B), (0, 0)))
        if valid_lens is not None:
            valid_lens = jnp.pad(valid_lens, (0, Bp - B))
        else:
            valid_lens = jnp.concatenate(
                [jnp.full(B, N, jnp.int32), jnp.zeros(Bp - B, jnp.int32)]
            )
    lens, acodes = _lut_lookup(data, lens_lut, acodes_lut,
                               _auto_gather_free(gather_free))
    if valid_lens is not None:
        mask = jnp.arange(N, dtype=jnp.int32)[None, :] < valid_lens[:, None]
        lens = jnp.where(mask, lens, 0)
        acodes = jnp.where(mask, acodes, jnp.uint32(0))
    words_t, bits_t = pack_blocks_pallas(acodes.T, lens.T, interpret=interpret)
    return words_t.T[:B], bits_t[0, :B]

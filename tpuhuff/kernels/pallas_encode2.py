"""Pallas TPU kernel v2: fused canonical-LUT + width-bounded VMEM bit-merge.

Differences from :mod:`pallas_encode` (v1), driven by sessions 6-10:

* **Fused symbol lookup.** The canonical ladder LUT (inverse-permutation
  rank + compare ladder, ~110 ops/symbol vs ~320 for the dense select
  trees) runs inside the kernel, so per-symbol (len, acode) never touch
  HBM.  Requires canonical codes — what the pipeline emits by default.
* **Halved merge rows.** When ``2*max_len <= 32`` the first level merges
  symbol pairs *within* one u32 (no word shift at all) and compacts with a
  stride-2 row slice; every later level then runs on N/2 rows instead of N.
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

__all__ = ["encode_blocks_pallas2"]

LANES = 128


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


def _encode_kernel(data_ref, valid_ref, inv4_ref, pres_ref, cumle_ref,
                   dd_ref, words_ref, bits_ref, *, N: int, ML: int):
    d = data_ref[:]  # (N, 128) int32
    row = jax.lax.broadcasted_iota(jnp.int32, (N, LANES), 0)

    # ---- canonical ladder LUT (see kernels.encode.lut_canonical) ----
    bits_d = [((d >> (k + 2)) & 1) == 1 for k in range(6)]
    word = _sel_scalar(bits_d, inv4_ref, 0, 64)
    sh = ((d & 3).astype(jnp.uint32) * 8)
    rank = ((word >> sh) & jnp.uint32(0xFF)).astype(jnp.int32)
    ln = jnp.ones((N, LANES), jnp.int32)
    dlt = dd_ref[0, 0] + jnp.zeros((N, LANES), jnp.int32)
    for L in range(1, ML):
        ind = (rank >= cumle_ref[0, L - 1]).astype(jnp.int32)
        ln = ln + ind
        dlt = dlt + ind * dd_ref[0, L]
    wbits = [((d >> (k + 5)) & 1) == 1 for k in range(3)]
    pword = _sel_scalar(wbits, pres_ref, 0, 8)
    member = ((pword >> (d.astype(jnp.uint32) & 31)) & 1) == 1
    ln = jnp.where(member & (row < valid_ref[:]), ln, 0)
    x = jnp.where(
        ln == 0, jnp.uint32(0),
        (rank + dlt).astype(jnp.uint32)
        << ((jnp.uint32(32) - ln.astype(jnp.uint32)) & 31),
    )
    alen = ln

    halved = 2 * ML <= 32
    if halved:
        # ---- level 0: pair merge inside one u32, stride-2 compaction ----
        a, b = x[0::2], x[1::2]
        la, lb = alen[0::2], alen[1::2]
        x = a | (b >> la.astype(jnp.uint32))  # la<32; la==0 => a==0
        alen = la + lb
        rows, W, gsyms = N // 2, 1, 2
    else:
        rows, W, gsyms = N, 1, 1

    # ---- doubling levels with width-bounded shift trees ----
    while gsyms < N:
        rowv = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
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

    words_ref[:] = x
    bits_ref[:] = alen[0:1]


def _roll_up(x, s):
    return jnp.concatenate(
        [x[s:], jnp.zeros((s, x.shape[1]), x.dtype)], axis=0
    )


def _roll_down(x, s):
    return jnp.concatenate(
        [jnp.zeros((s, x.shape[1]), x.dtype), x[:-s]], axis=0
    )


@functools.partial(
    jax.jit, static_argnames=("max_len", "interpret")
)
def _encode_call(data_t, valid_t, inv4, pres, cumle, dd, max_len, interpret):
    N, B = data_t.shape
    halved = 2 * max_len <= 32
    N2 = N // 2 if halved else N
    kernel = functools.partial(_encode_kernel, N=N, ML=max_len)
    return pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[
            pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N2, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N2, B), jnp.uint32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(data_t, valid_t, inv4, pres, cumle, dd)


def encode_blocks_pallas2(
    data: jnp.ndarray,
    canon_tables,
    max_len: int,
    valid_lens: jnp.ndarray | None = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode (B, N) uint8 blocks with the fused canonical Pallas kernel.

    ``canon_tables`` = the four arrays from
    :func:`tpuhuff.kernels.encode.make_canonical_encode_tables` (invperm4,
    present, cumle, dd); ``max_len`` their static ladder bound.  Returns
    ``(words (B, W) u32, bits (B,) i32)`` — bit-identical to
    :func:`tpuhuff.kernels.encode.encode_blocks`.
    """
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
    data_t = data.T.astype(jnp.int32)
    valid_t = (jnp.full((1, Bp), N, jnp.int32) if valid_lens is None
               else valid_lens.astype(jnp.int32)[None, :])
    inv4 = jnp.asarray(inv4, jnp.uint32).reshape(1, 64)
    pres = jnp.asarray(pres, jnp.uint32).reshape(1, 8)
    cumle32 = jnp.zeros((1, 32), jnp.int32).at[0, : np.asarray(cumle).size].set(
        jnp.asarray(cumle, jnp.int32))
    dd32 = jnp.zeros((1, 32), jnp.int32).at[0, : np.asarray(dd).size].set(
        jnp.asarray(dd, jnp.int32))
    words_t, bits_t = _encode_call(data_t, valid_t, inv4, pres, cumle32,
                                   dd32, int(max_len), bool(interpret))
    return words_t.T[:B], bits_t[0, :B]

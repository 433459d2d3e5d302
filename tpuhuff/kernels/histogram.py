"""Device histogram: 256-bin byte counts without scatters.

The TPU-native replacement for the reference's thread-per-chunk histogram
(`/root/reference/huff_coding/src/weights.rs:293-319`).  Scatter-add is
serial on TPU, so the kernel uses the **nibble outer-product** formulation:

    byte = hi4 * 16 + lo4
    hist[hi, lo] = sum_i onehot16(hi_i)[hi] * onehot16(lo_i)[lo]
    =>  hist(16,16) = onehot16(hi).T @ onehot16(lo)

One MXU contraction over the data axis produces the whole 256-bin table;
one-hot construction is 2x16 compares per byte on the VPU (vs 256 for a
direct one-hot-256 reduce).  f32 accumulation is exact below 2^24 per tile,
so data is chunked and accumulated in int32/int64 outside the matmul.

Cross-chip merge is a plain ``psum`` over the mesh axis
(:mod:`tpuhuff.dist`) — the collective analogue of the reference's
``add_byte_weights`` join (`weights.rs:308-318`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["histogram", "histogram_u32"]

# keep per-matmul counts < 2^24 for exact f32 accumulation
_CHUNK = 1 << 22


@jax.jit
def _hist_chunk(chunk: jnp.ndarray) -> jnp.ndarray:
    """(n,) uint8 -> (256,) int32 via the nibble outer product.

    bfloat16 one-hots: int8 operands were tried (half the materialized
    HBM) but measured 1.19 ms vs bf16's 0.71 ms for 16 MiB on v5e — the
    i8 MXU path tiles poorly at K=16.  f32 accumulation is exact for the
    0/1 one-hots below 2^24 per tile, guaranteed by ``_CHUNK``.
    """
    hi = (chunk >> 4).astype(jnp.int32)
    lo = (chunk & 15).astype(jnp.int32)
    iota = jnp.arange(16, dtype=jnp.int32)
    oh_hi = (hi[:, None] == iota[None, :]).astype(jnp.bfloat16)
    oh_lo = (lo[:, None] == iota[None, :]).astype(jnp.bfloat16)
    h = jnp.dot(oh_hi.T, oh_lo, preferred_element_type=jnp.float32)
    return h.reshape(256).astype(jnp.int32)


@jax.jit
def histogram(data: jnp.ndarray) -> jnp.ndarray:
    """(..., n) uint8 -> (256,) int32 histogram over all elements."""
    flat = data.reshape(-1)
    n = flat.shape[0]
    if n <= _CHUNK:
        return _hist_chunk(flat)
    # pad to a whole number of chunks with byte 0, then subtract the padding
    n_chunks = (n + _CHUNK - 1) // _CHUNK
    padded = jnp.pad(flat, (0, n_chunks * _CHUNK - n))
    hists = jax.vmap(_hist_chunk)(padded.reshape(n_chunks, _CHUNK))
    total = jnp.sum(hists, axis=0)
    return total.at[0].add(-(n_chunks * _CHUNK - n))


def histogram_u32(data: jnp.ndarray) -> jnp.ndarray:
    return histogram(data)

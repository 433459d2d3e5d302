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

    Operand dtype does NOT matter here: r3 measured bf16, int8/f32-acc and
    int8/i32-acc all at ~4.0 ms / 16 MiB standalone — the cost is the HBM
    materialization of the dot operands, not the MXU pass.  (This corrects
    r2's contradictory notes of 0.35 ms vs 1.19 ms for int8.)  f32
    accumulation is exact for 0/1 one-hots below 2^24 per tile, guaranteed
    by ``_CHUNK``.  The real fix is the Pallas kernel
    (`pallas_histogram.py`), which keeps operands in VMEM.
    """
    hi = (chunk >> 4).astype(jnp.int32)
    lo = (chunk & 15).astype(jnp.int32)
    iota = jnp.arange(16, dtype=jnp.int32)
    oh_hi = (hi[:, None] == iota[None, :]).astype(jnp.bfloat16)
    oh_lo = (lo[:, None] == iota[None, :]).astype(jnp.bfloat16)
    h = jnp.dot(oh_hi.T, oh_lo, preferred_element_type=jnp.float32)
    return h.reshape(256).astype(jnp.int32)


@jax.jit
def histogram_xla(data: jnp.ndarray) -> jnp.ndarray:
    """(..., n) uint8 -> (256,) int32 histogram, XLA one-hot matmul path."""
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


@jax.jit
def histogram(data: jnp.ndarray) -> jnp.ndarray:
    """(..., n) uint8 -> (256,) int32 histogram over all elements.

    On TPU, large inputs take the Pallas grouped one-hot kernel
    (:mod:`tpuhuff.kernels.pallas_histogram`, ~2-6x this module's XLA
    matmul — the XLA dot must materialize its one-hot operands in HBM);
    elsewhere, and for small inputs, the XLA path.  Both are exact.
    """
    n = int(np_size(data))
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        from .pallas_histogram import PALLAS_HIST_MIN_BYTES, histogram_pallas

        if n >= PALLAS_HIST_MIN_BYTES:
            return histogram_pallas(data)
    return histogram_xla(data)


def np_size(x) -> int:
    return int(x.size) if hasattr(x, "size") else len(x)


def histogram_u32(data: jnp.ndarray) -> jnp.ndarray:
    return histogram(data)

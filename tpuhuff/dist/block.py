"""Block-parallel encode pipeline under ``shard_map``.

The TPU-native version of the reference CLI's two-pass streaming compress
(`/root/reference/huff/src/comp.rs:32-74`):

* pass 1 — per-chip histograms of the local blocks, merged with a single
  ``psum`` over the mesh (ICI), replacing the thread-join+add merge
  (`weights.rs:306-318`).  The tree itself is built on host from the 256
  counts (O(k log k), k<=256 — microseconds, `tree_inner.rs:289-303`).
* pass 2 — every chip packs its blocks with the broadcast LUTs
  (:func:`tpuhuff.kernels.encode_blocks`); per-block bit lengths come back
  with the words, and the host (or the ``.hf2`` writer) does the ordered
  bit-carry concatenation — correctly, unlike the reference's seek-back
  stitch (`huff/src/comp.rs:196-201`, SURVEY §2 quirk).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels import encode_blocks, make_encode_tables
from ..kernels.histogram import histogram
from .mesh import BLOCK_AXIS, make_mesh

__all__ = [
    "sharded_histogram",
    "sharded_encode",
    "sharded_count_missing",
    "sharded_decode_blocks",
    "encode_pipeline",
    "encode_pipeline_arrays",
    "pad_to_blocks",
]


def pad_to_blocks(
    data: np.ndarray, block_len: int, n_shards: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Reshape a byte stream to (B, block_len), B a multiple of n_shards.

    Returns ``(blocks, valid_lens, orig_len)``; ``valid_lens[b]`` is the
    number of real bytes in block b (padding bytes beyond it are masked out
    by the encode kernel, so they emit no bits and no histogram counts are
    taken from them).
    """
    n = data.size
    blocks = max(1, -(-n // block_len))
    blocks = -(-blocks // n_shards) * n_shards
    padded = np.zeros(blocks * block_len, dtype=np.uint8)
    padded[:n] = data
    valid = np.clip(n - np.arange(blocks, dtype=np.int64) * block_len, 0, block_len)
    return padded.reshape(blocks, block_len), valid.astype(np.int32), n


def _hist_shard(local: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    h = histogram(local)
    # padding bytes are 0-valued; subtract their count so the tree sees only
    # real data (the analogue of hashing only what was read,
    # huff/src/comp.rs:167-169)
    pad = jnp.sum(jnp.int32(local.shape[-1]) - valid)
    h = h.at[0].add(-pad)
    return jax.lax.psum(h, BLOCK_AXIS)


def sharded_histogram(
    blocks: jnp.ndarray, valid_lens: jnp.ndarray, mesh: Mesh
) -> np.ndarray:
    """Global 256-bin histogram of (B, N) blocks sharded over the mesh."""
    fn = jax.shard_map(
        _hist_shard, mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)), out_specs=P(),
    )
    return np.asarray(jax.jit(fn)(blocks, valid_lens))


def sharded_count_missing(
    blocks: jnp.ndarray, valid_lens: jnp.ndarray, lens_lut, mesh: Mesh,
) -> int:
    """Global count of valid bytes with no code (LUT len 0) over the mesh.

    The sharded twin of :func:`tpuhuff.kernels.encode.count_missing` — the
    guard for the silent missing-letter case (`comp.rs:427-432`)."""
    from ..kernels.encode import _auto_gather_free, lut_lens

    gf = _auto_gather_free(None)

    def shard(local, valid, ll):
        idx = local.astype(jnp.int32)
        lens = lut_lens(idx, ll) if gf else jnp.take(ll, idx, axis=0)
        N = local.shape[-1]
        miss = jnp.where(
            jnp.arange(N, dtype=jnp.int32)[None, :] < valid[:, None],
            (lens == 0).astype(jnp.int32), 0,
        )
        return jax.lax.psum(jnp.sum(miss), BLOCK_AXIS)

    fn = jax.shard_map(
        shard, mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P()), out_specs=P(),
    )
    return int(jax.jit(fn)(blocks, valid_lens, lens_lut))


def sharded_encode(
    blocks: jnp.ndarray, valid_lens: jnp.ndarray, lens_lut, acodes_lut,
    mesh: Mesh, max_code_len: int | None = None, canon_tables=None,
    check_missing: bool = True, full_alphabet: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack (B, N) blocks data-parallel; returns (words (B, W), bits (B,)).

    ``check_missing`` (default on): counts valid bytes with no code and
    raises :class:`CompressError` instead of silently dropping them
    (reference `comp.rs:427-432`).  The count rides the encode program
    (``with_miss`` — free in the fused Pallas kernel, one fused LUT pass
    elsewhere) with a ``psum`` across the mesh; no separate dispatch.
    :func:`encode_pipeline` passes False — its histogram-vs-LUT host
    check already guarantees coverage.
    """
    def shard(local, valid, ll, al, *canon):
        kw = {"full_alphabet": full_alphabet}
        if max_code_len is not None:
            kw["max_code_len"] = max_code_len
        if canon:
            kw["canon_tables"] = canon
        if check_missing:
            words, bits, miss = encode_blocks(local, ll, al, valid,
                                              with_miss=True, **kw)
            return words, bits, jax.lax.psum(miss, BLOCK_AXIS)
        return encode_blocks(local, ll, al, valid, **kw)

    canon = tuple(canon_tables) if canon_tables is not None else ()
    out_specs = ((P(BLOCK_AXIS), P(BLOCK_AXIS), P()) if check_missing
                 else (P(BLOCK_AXIS), P(BLOCK_AXIS)))
    fn = jax.shard_map(
        shard,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(), P()) + (P(),) * len(canon),
        out_specs=out_specs,
    )
    out = jax.jit(fn)(blocks, valid_lens, lens_lut, acodes_lut, *canon)
    if check_missing:
        words, bits, miss = out
        if int(miss):
            from ..core.format import CompressError

            raise CompressError(
                f"letter not found in codes ({int(miss)} bytes)", None
            )
        return words, bits
    return out


def sharded_decode_blocks(
    rows: jnp.ndarray, bit0: jnp.ndarray, nbits: jnp.ndarray, tree,
    block_len: int, mesh: Mesh, unroll: int | None = None,
) -> jnp.ndarray:
    """Block-parallel decode across the mesh (config-3's decode side).

    ``rows`` (B, W) u32 per-block word rows (``payload_to_lane_words``
    layout), sharded over ``BLOCK_AXIS``; decode tables replicate.  Every
    chip runs the canonical-ladder decoder on its blocks (the fused Pallas
    kernel on TPU, the XLA scan elsewhere); returns (B, block_len) uint8
    with the same sharding.  Non-canonical (foreign, e.g. reference-built
    ``tree_inner.rs:422-440``) trees take the general interval-search
    kernel instead (r4, VERDICT r3 missing #3) — same contract, ~2.7x
    slower per symbol (PERF_NOTES r3 roofline).  B and the per-shard block
    count must be multiples of 8*128 for the Pallas route.
    """
    from ..kernels.decode import (
        decode_blocks_canonical, decode_blocks_device,
        make_canonical_decode_tables, make_decode_tables,
    )

    canon = make_canonical_decode_tables(tree)
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if unroll is None:
        unroll = next(s for s in ((16, 8, 4, 2, 1) if on_tpu else (1,))
                      if block_len % s == 0)

    if canon is not None:
        ub, dd, perm4, ml = canon
        if on_tpu:
            from ..kernels.pallas_decode import (
                decode_rows_fused, make_fused_tables,
            )

            t1, t2, t3 = make_fused_tables(ub, dd, perm4)

            def shard(r, b0, nb, a1, a2, a3):
                return decode_rows_fused(r, b0, nb, a1, a2, a3, ml,
                                         block_len, unroll)

            tabs = (t1, t2, t3)
        else:
            def shard(r, b0, nb, a1, a2, a3):
                out = decode_blocks_canonical(r, b0, nb, a1, a2, a3, ml,
                                              block_len, unroll)
                return out.astype(jnp.uint8)

            tabs = (ub, dd, perm4)
    else:
        thr, sym4, len4 = make_decode_tables(tree)
        lens_lut, _ = tree.encode_tables()
        n_leaves = int((np.asarray(lens_lut) > 0).sum())
        levels = max(1, (max(n_leaves, 2) - 1).bit_length())
        # the tree's real max code length (NOT initial=32, which made the
        # bound a no-op and disabled the roll/window-select pruning —
        # ADVICE r4 #1); 32 only as the empty-code-set fallback
        msb_arr = np.asarray(lens_lut)
        msb = int(msb_arr.max(initial=0)) or 32
        if on_tpu:
            from ..kernels.pallas_decode import (
                decode_rows_fused_general, make_general_fused_tables,
            )

            t1, t2, t3 = make_general_fused_tables(thr, sym4, len4)

            def shard(r, b0, nb, a1, a2, a3):
                return decode_rows_fused_general(r, b0, nb, a1, a2, a3,
                                                 block_len, unroll,
                                                 levels=levels,
                                                 max_sym_bits=msb)

            tabs = (t1, t2, t3)
        else:
            jthr = jnp.asarray(np.asarray(thr), jnp.uint32)

            def shard(r, b0, nb, a1, a2, a3):
                out = decode_blocks_device(r, b0, nb, a1, a2, a3,
                                           block_len, unroll)
                return out.astype(jnp.uint8)

            tabs = (jthr, sym4, len4)

    fn = jax.shard_map(
        shard, mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS),
                  P(), P(), P()),
        out_specs=P(BLOCK_AXIS),
    )
    return jax.jit(fn)(rows, bit0, nbits, *tabs)


def encode_pipeline(
    data: np.ndarray,
    block_len: int = 65536,
    mesh: Mesh | None = None,
    max_code_len: int = 32,
    canonical: bool = False,
) -> Tuple[np.ndarray, np.ndarray, "object", int]:
    """Full two-pass pipeline: psum histogram -> host tree -> sharded pack.

    Returns ``(words (B, N) u32, bit_lens (B,), tree, orig_len)``.
    """
    if mesh is None:
        mesh = make_mesh()
    n_shards = mesh.devices.size
    blocks, valid, orig_len = pad_to_blocks(
        np.asarray(data, dtype=np.uint8).ravel(), block_len, n_shards
    )
    words, bits, tree = encode_pipeline_arrays(
        jnp.asarray(blocks), jnp.asarray(valid), mesh, max_code_len, canonical
    )
    return np.asarray(words), np.asarray(bits), tree, orig_len


def encode_pipeline_arrays(
    jblocks: jnp.ndarray,
    jvalid: jnp.ndarray,
    mesh: Mesh,
    max_code_len: int = 32,
    canonical: bool = False,
):
    """Device-array core of the pipeline: psum histogram -> host tree ->
    sharded pack.  ``jblocks``/``jvalid`` may be global (multi-process)
    arrays sharded over ``mesh``; the returned ``(words, bits)`` carry the
    same block sharding and ``tree`` is identical on every process (the
    histogram is a global psum).  ``canonical`` re-assigns canonical codes
    (same lengths/size; enables the fast ladder decoder)."""
    from ..core.canonical import build_tree_for_device, canonicalize
    from ..core.weights import ByteWeights

    counts = sharded_histogram(jblocks, jvalid, mesh).astype(np.int64)
    # device codewords live in u32 lanes; on (pathological) trees deeper
    # than 32 the pipeline switches to the optimal length-limited code —
    # still a valid .hff tree, marginally larger output (PARITY.md)
    tree, _limited = build_tree_for_device(ByteWeights(counts), max_len=max_code_len)
    canon_tabs = None
    full_alpha = False
    if canonical:
        from ..kernels.encode import make_canonical_encode_tables

        tree = canonicalize(tree)
        tabs = make_canonical_encode_tables(tree)
        if tabs is not None:
            canon_tabs = tabs[:4]  # arrays; max_len rides max_code_len below
            full_alpha = tabs[5]
    lens, codes = tree.encode_tables()
    # coverage guard (reference `comp.rs:427-432`): every byte seen by the
    # histogram must have a code, or the kernels would silently emit 0 bits
    # for it.  Free on host; can only trip if the tree builder misbehaves.
    uncovered = np.flatnonzero((counts > 0) & (np.asarray(lens) == 0))
    if uncovered.size:
        from ..core.format import CompressError

        raise CompressError("letter not found in codes", int(uncovered[0]))
    dl, da = make_encode_tables(lens, codes)
    words, bits = sharded_encode(jblocks, jvalid, dl, da, mesh,
                                 max_code_len=int(lens.max()),
                                 canon_tables=canon_tabs,
                                 check_missing=False,
                                 full_alphabet=full_alpha)
    return words, bits, tree

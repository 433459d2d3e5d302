"""Multi-host orchestration (SPMD over DCN + ICI).

Config-5 path (SURVEY §5 "Distributed communication backend"): every host
loads its own byte range, all processes enter the same ``shard_map``
program, the 256-bin histogram rides a global ``psum`` (ICI within a slice,
DCN across hosts), and host 0 performs the ordered write exactly where the
reference's single-threaded ``writer.write_all`` loop sits
(`/root/reference/huff/src/comp.rs:207-223`).

On a single host everything degenerates to the local mesh pipeline, so this
module is exercised by the regular test suite too.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from .block import encode_pipeline
from .mesh import make_mesh

__all__ = [
    "initialize",
    "is_coordinator",
    "host_shard_range",
    "compress_multihost",
    "compress_file_multihost",
    "decompress_file_multihost",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with env-var defaults
    (``TPUHUFF_COORDINATOR`` / ``TPUHUFF_NUM_PROCESSES`` /
    ``TPUHUFF_PROCESS_ID``); no-op when single-host or already
    initialized.

    The already-initialized probe must NOT touch the XLA backend:
    ``jax.process_count()`` initializes it, after which
    ``jax.distributed.initialize`` unconditionally raises (review r4) —
    so probe the distributed client state directly."""
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
    except Exception:
        pass
    if coordinator_address is None:
        coordinator_address = os.environ.get("TPUHUFF_COORDINATOR")
    if coordinator_address is None:
        return  # single-host
    if num_processes is None and "TPUHUFF_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["TPUHUFF_NUM_PROCESSES"])
    if process_id is None and "TPUHUFF_PROCESS_ID" in os.environ:
        process_id = int(os.environ["TPUHUFF_PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # keep the public entry point idempotent even if the private
        # global_state probe above breaks in a future JAX (ADVICE r4 #3):
        # a second initialize raises RuntimeError("...already initialized")
        if "already initialized" not in str(e).lower():
            raise


def _allgather_i64(arr: np.ndarray) -> np.ndarray:
    """``process_allgather`` for 64-bit payloads.

    x64 is disabled in this project, so JAX device_put-canonicalizes
    int64 -> int32 and any value >= 2^31 silently wraps (review r4:
    exactly the >2 GiB-per-shard histogram/size regime config 5 targets).
    Ship hi/lo uint32 halves instead and reassemble.  Returns
    (nproc, *arr.shape) int64; values must be non-negative."""
    from jax.experimental import multihost_utils

    a = np.ascontiguousarray(arr).astype(np.int64)
    lo = (a & np.int64(0xFFFFFFFF)).astype(np.uint32)
    hi = (a >> np.int64(32)).astype(np.uint32)
    g = multihost_utils.process_allgather(np.stack([lo, hi]))
    return ((g[:, 1].astype(np.int64) << 32)
            | g[:, 0].astype(np.int64))


def is_coordinator() -> bool:
    return jax.process_index() == 0


def host_shard_range(total_len: int, block_len: int) -> Tuple[int, int]:
    """[start, end) byte range this host should load: whole blocks,
    contiguous, balanced across processes."""
    nproc = jax.process_count()
    pid = jax.process_index()
    n_blocks = max(1, -(-total_len // block_len))
    per = -(-n_blocks // nproc)
    lo_b, hi_b = pid * per, min((pid + 1) * per, n_blocks)
    return lo_b * block_len, min(hi_b * block_len, total_len)


def _per_host_block_quota(total_len: int, block_len: int) -> int:
    """Blocks each host contributes to the global array: the max any host
    owns, rounded up to a multiple of the local device count so the 1-D
    mesh splits evenly.  Hosts with fewer real blocks pad with empty
    (valid=0) blocks, which emit no bits and no histogram counts."""
    nproc = jax.process_count()
    n_blocks = max(1, -(-total_len // block_len))
    per = -(-n_blocks // nproc)
    ld = jax.local_device_count()
    return -(-per // ld) * ld


def compress_file_multihost(
    src_path: str, dst_path: str, block_len: int = 65536,
    canonical: bool = True, chunk_bytes: int | None = None,
    check: bool = True,
) -> None:
    """Config-5 orchestration, STREAMING: two passes in O(chunk) memory per
    host (the multi-host twin of ``read_compress_write_hf2``).

    * pass 1 — every host streams its contiguous byte range into a local
      256-bin histogram; one all-gather of the tables merges them (the DCN
      analogue of the reference's thread-join merge, `weights.rs:306-318`),
      and every host builds the identical tree.
    * pass 2 — the file's blocks are split into super-chunks of
      ``chunk_bytes``; super-chunk s is encoded by host ``s % nproc`` on its
      local devices (the tree is fixed, so pass 2 is embarrassingly
      parallel).  Each round all-gathers one super-chunk per host, and the
      coordinator appends them IN ORDER through the bit-carrying sink while
      patching the block table in place — no host ever holds more than a
      round of data.

    Every process calls this with the same paths (SPMD); only process 0
    writes.  Single-process: identical output, plain local loop.

    ``check`` (r5): the per-span CRC32 integrity column is built
    DISTRIBUTEDLY — each owner CRCs its super-chunk split at global span
    boundaries, and the coordinator folds the (crc, len) pieces with
    :func:`crc32_combine`; only 12 bytes per piece cross DCN.  The output
    is byte-identical to the single-process ``read_compress_write_hf2``.
    """
    from ..core.canonical import build_tree_for_device, canonicalize
    from ..core.weights import ByteWeights
    from ..io.hff import (
        default_crc_every, hf2_table_width, write_hf2_crc_slice,
        write_hf2_prelude, write_hf2_table_slice,
    )
    from ..io.stream import (
        _BitSink, _device_block_encoder, crc32_combine, crc_span_pieces,
    )

    nproc = jax.process_count()
    total = os.path.getsize(src_path)
    n_blocks = max(1, -(-total // block_len)) if total else 1
    chunk = chunk_bytes if chunk_bytes is not None else (64 << 20)
    sc_blocks = max(1, chunk // block_len)          # blocks per super-chunk
    n_sc = -(-n_blocks // sc_blocks)                # super-chunks in file

    # ---- pass 1: per-host streamed histogram + global merge ----
    counts = np.zeros(256, dtype=np.int64)
    with open(src_path, "rb") as fp:
        lo, hi = host_shard_range(total, block_len)
        fp.seek(lo)
        left = hi - lo
        while left > 0:
            piece = fp.read(min(left, chunk))
            if not piece:
                break
            counts += np.asarray(ByteWeights.from_bytes(piece).counts,
                                 dtype=np.int64)
            left -= len(piece)
    if nproc > 1:
        counts = _allgather_i64(counts).sum(axis=0)
    tree, _limited = build_tree_for_device(ByteWeights(counts), max_len=32)
    if canonical:
        tree = canonicalize(tree)
    lens_lut, _ = tree.encode_tables()
    ml = int(np.asarray(lens_lut).max(initial=1))
    width = hf2_table_width(block_len, ml)
    enc = _device_block_encoder(tree, block_len)

    ce = default_crc_every(block_len) if check else 0
    span = ce * block_len
    # max span-pieces one super-chunk can produce (whole spans + 2 edges)
    n_pieces = (sc_blocks * block_len) // span + 2 if ce else 0

    # ---- pass 2: round-robin super-chunks, ordered coordinator write ----
    dst = table_off = crc_off = sink = None
    # coordinator's streaming span-fold state (crc32_combine over pieces)
    run_crc = run_len = span_idx = 0
    if is_coordinator():
        dst = open(dst_path, "wb")
        table_off, crc_off, _ = write_hf2_prelude(
            dst, tree, total, block_len, n_blocks, width, canonical,
            crc_every=ce)
        sink = _BitSink(dst)
    pid = jax.process_index()
    cap_bytes = sc_blocks * block_len * ml // 8 + 8  # payload bound/super-chunk
    with open(src_path, "rb") as fp:
        for r in range(-(-n_sc // nproc)):
            s_mine = r * nproc + pid
            my_payload = b""
            my_lens = np.zeros(sc_blocks, dtype=np.uint64)
            my_pieces = np.zeros((max(n_pieces, 1), 2), dtype=np.int64)
            my_nb = 0
            if s_mine < n_sc:
                b0 = s_mine * sc_blocks
                b1 = min(b0 + sc_blocks, n_blocks)
                fp.seek(b0 * block_len)
                data = np.frombuffer(
                    fp.read(min(b1 * block_len, total) - b0 * block_len),
                    dtype=np.uint8,
                )
                my_nb = b1 - b0
                if data.size:
                    my_payload, _nbits, bl = enc(data, my_nb)
                    my_lens[: my_nb] = bl
                    if ce:
                        for j, (c, ln) in enumerate(
                                crc_span_pieces(data, b0 * block_len, span)):
                            my_pieces[j] = (c, ln)
            if nproc > 1:
                from jax.experimental import multihost_utils

                # gather the (64-bit-safe) lengths FIRST, then pad the
                # payload only to the round's max, bucketed to a power of
                # two so collective shapes stay reusable — the old fixed
                # worst-case pad shipped ~ml/8 x the uncompressed chunk
                # per host per round over DCN regardless of payload
                meta = np.asarray([len(my_payload), my_nb])
                metas = _allgather_i64(meta)
                round_max = int(metas[:, 0].max())
                bucket = max(4096, 1 << (max(round_max, 1) - 1).bit_length())
                bucket = min(bucket, cap_bytes)
                pad = np.zeros(max(bucket, 1), dtype=np.uint8)
                pad[: len(my_payload)] = np.frombuffer(my_payload, np.uint8)
                pays = multihost_utils.process_allgather(pad)
                lens_all = _allgather_i64(my_lens).astype(np.uint64)
                pieces_all = (_allgather_i64(my_pieces) if ce else None)
            else:
                metas = np.asarray([[len(my_payload), my_nb]])
                pays = np.frombuffer(my_payload, np.uint8)[None, :]
                lens_all = my_lens[None, :]
                pieces_all = my_pieces[None, :] if ce else None
            if is_coordinator():
                for h in range(nproc):
                    s = r * nproc + h
                    if s >= n_sc:
                        break
                    nb_h = int(metas[h, 1])
                    bl = lens_all[h, :nb_h]
                    write_hf2_table_slice(dst, table_off, width,
                                          s * sc_blocks, bl)
                    sink.write(pays[h, : int(metas[h, 0])].tobytes(),
                               int(bl.sum()))
                    if ce:
                        # fold this super-chunk's span pieces in order
                        for c, ln in pieces_all[h]:
                            if ln == 0:
                                break
                            run_crc = (int(c) if run_len == 0 else
                                       crc32_combine(run_crc, int(c),
                                                     int(ln)))
                            run_len += int(ln)
                            if run_len == span:
                                write_hf2_crc_slice(
                                    dst, crc_off, span_idx,
                                    np.asarray([run_crc], np.uint32))
                                span_idx += 1
                                run_crc = run_len = 0
    if is_coordinator():
        if ce and run_len:
            write_hf2_crc_slice(dst, crc_off, span_idx,
                                np.asarray([run_crc], np.uint32))
        sink.flush()
        dst.close()
    if nproc > 1:
        # SPMD contract: the container exists for every process on return
        # (e.g. a multihost decode of the same file may start immediately)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("tpuhuff:hf2:written")


def compress_multihost(
    local_data: np.ndarray, block_len: int = 65536,
    total_len: Optional[int] = None, canonical: bool = False,
):
    """Compress this host's shard; returns (words, bits, tree, orig_len).

    Multi-process: per-host blocks are assembled into one global array
    sharded over the global 1-D mesh (``host_local_array_to_global_array``),
    the histogram psum crosses hosts over DCN, and the identical tree is
    rebuilt on every host from the replicated counts.  The returned
    ``(words, bits)`` are this host's own blocks (host-local views of the
    sharded outputs).  With one process this is exactly the local pipeline.
    """
    if jax.process_count() == 1:
        return encode_pipeline(local_data, block_len=block_len,
                               mesh=make_mesh(), canonical=canonical)

    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from .block import encode_pipeline_arrays, pad_to_blocks
    from .mesh import BLOCK_AXIS

    if total_len is None:
        total_len = int(
            multihost_utils.process_allgather(
                np.asarray([local_data.size], np.int64)
            ).sum()
        )
    quota = _per_host_block_quota(total_len, block_len)
    blocks, valid, orig_len = pad_to_blocks(
        np.asarray(local_data, dtype=np.uint8).ravel(), block_len, 1
    )
    if blocks.shape[0] > quota:
        raise ValueError(
            f"host shard has {blocks.shape[0]} blocks > quota {quota}"
        )
    if blocks.shape[0] < quota:
        extra = quota - blocks.shape[0]
        blocks = np.concatenate(
            [blocks, np.zeros((extra, block_len), np.uint8)], axis=0
        )
        valid = np.concatenate([valid, np.zeros(extra, np.int32)])
    mesh = make_mesh()  # global: jax.devices() spans all processes
    gblocks = multihost_utils.host_local_array_to_global_array(
        blocks, mesh, P(BLOCK_AXIS)
    )
    gvalid = multihost_utils.host_local_array_to_global_array(
        valid, mesh, P(BLOCK_AXIS)
    )
    words_g, bits_g, tree = encode_pipeline_arrays(gblocks, gvalid, mesh,
                                                   canonical=canonical)
    words = multihost_utils.global_array_to_host_local_array(
        words_g, mesh, P(BLOCK_AXIS)
    )
    bits = multihost_utils.global_array_to_host_local_array(
        bits_g, mesh, P(BLOCK_AXIS)
    )
    return np.asarray(words), np.asarray(bits), tree, orig_len


def decompress_file_multihost(
    src_path: str, dst_path: str, device: bool = True,
    threads: Optional[int] = None, check: bool = True,
) -> None:
    """Config-5 decode side: every host reads ONLY the payload byte range
    covering its contiguous block share of the ``.hf2``, decodes it
    (device ladder kernel or threaded C++ DFA), and ``pwrite``s its slice
    of the output file — no host ever holds the whole payload or output.

    SPMD: all processes call with the same paths.  The coordinator creates/
    truncates the output; a global barrier orders create -> parallel write
    -> return.  Single-process: degenerates to a plain local decode.
    """
    from ..io.hff import read_hf2_header
    from ..io.stream import StreamError

    with open(src_path, "rb") as fp:
        hdr = read_hf2_header(fp)
    # same malformed-table rejection as the local reader: non-monotonic
    # offsets would drive negative reads / wrapped slices below
    _e = hdr.end_bits.astype(np.int64)
    if _e.size and np.any(np.diff(_e) < 0):
        raise StreamError(
            f"{src_path!r} stores invalid header information",
            "InvalidHeaderInfo",
        )
    B = hdr.num_blocks
    if device and hdr.block_len > 2048:
        # big-block containers force a block_len-step sequential scan per
        # device lane — route to the threaded DFA exactly like the local
        # reader (io/stream.py) so the two paths agree
        device = False
    pc, pid = jax.process_count(), jax.process_index()
    per = -(-B // pc)
    lo_b, hi_b = pid * per, min((pid + 1) * per, B)

    def _barrier(tag: str) -> None:
        if pc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    # coordinator sizes the output, everyone waits, then writes its range
    if is_coordinator():
        with open(dst_path, "wb") as out:
            out.truncate(hdr.orig_len)
    _barrier("tpuhuff:hf2dec:create")
    if lo_b < hi_b:
        ends = hdr.end_bits.astype(np.int64)
        starts = np.concatenate([[0], ends[:-1]])
        bit_lo = int(starts[lo_b])
        bit_hi = int(ends[hi_b - 1])
        byte_lo, byte_hi = bit_lo // 8, (bit_hi + 7) // 8
        with open(src_path, "rb") as fp:
            fp.seek(hdr.payload_offset + byte_lo)
            payload = fp.read(byte_hi - byte_lo)
        rel_starts = starts[lo_b:hi_b] - byte_lo * 8
        rel_ends = ends[lo_b:hi_b] - byte_lo * 8
        out_lo = lo_b * hdr.block_len
        out_len = min(hdr.orig_len, hi_b * hdr.block_len) - out_lo
        if hdr.tree.is_leaf(hdr.tree.root):
            out_bytes = bytes([int(hdr.tree.letters[hdr.tree.root])]) * out_len
        elif device:
            from ..kernels.decode import decode_rows_device, payload_to_lane_words

            rows, bit0 = payload_to_lane_words(
                payload, rel_starts, rel_ends, hdr.block_len
            )
            nbits = (rel_ends - rel_starts).astype(np.int32)
            out_arr = decode_rows_device(rows, bit0, nbits, hdr.tree,
                                         hdr.block_len)
            out_bytes = out_arr.reshape(-1)[:out_len].tobytes()
        else:
            from ..io.stream import _native

            nat = _native()
            if nat is None:
                raise RuntimeError("host multihost decode needs the native lib")
            tables = nat.build_dfa(hdr.tree)
            nb = hi_b - lo_b
            caps = np.full(nb, hdr.block_len, dtype=np.uint64)
            caps[-1] = out_len - (nb - 1) * hdr.block_len
            offs = np.arange(nb, dtype=np.uint64) * hdr.block_len
            out_buf, out_lens = nat.decode_blocks(
                np.frombuffer(payload, dtype=np.uint8),
                rel_starts.astype(np.uint64), rel_ends.astype(np.uint64),
                tables, offs, caps, threads)
            out_bytes = out_buf[:out_len].tobytes()
        if check and hdr.crcs is not None and hdr.crc_every and out_len > 0:
            # verify every CRC span fully contained in this host's block
            # range (a span straddling a host boundary — at most one per
            # seam, when the block quota is not a span multiple — has its
            # bytes split across hosts and is skipped; the local reader
            # verifies those on any whole-file decode)
            from ..io.stream import _crc_spans, _native

            ce = hdr.crc_every
            span_b = ce * hdr.block_len
            s0 = -(-lo_b // ce)
            s_full_end = hi_b // ce
            obuf = np.frombuffer(out_bytes, dtype=np.uint8)
            if s_full_end > s0:
                rel0 = s0 * span_b - out_lo
                got = _crc_spans(
                    obuf[rel0 : rel0 + (s_full_end - s0) * span_b],
                    span_b, _native())
                want = hdr.crcs[s0 : s_full_end]
                if not np.array_equal(got, want):
                    bad = s0 + int(np.argmax(got != want))
                    raise StreamError(
                        f"{src_path!r} block CRC mismatch in span {bad} "
                        f"(corrupt payload or index)", "CorruptData")
            if (hi_b == B and s_full_end * ce >= lo_b
                    and s_full_end < hdr.crcs.size):
                # the file's final (partial) span, fully owned by this host
                rel = s_full_end * span_b - out_lo
                got_t = _crc_spans(obuf[rel:], span_b, _native())
                if (got_t.size != 1
                        or int(got_t[0]) != int(hdr.crcs[s_full_end])):
                    raise StreamError(
                        f"{src_path!r} block CRC mismatch in span "
                        f"{s_full_end} (corrupt payload or index)",
                        "CorruptData")
        fd = os.open(dst_path, os.O_WRONLY)
        try:
            os.pwrite(fd, out_bytes, out_lo)
        finally:
            os.close(fd)
    _barrier("tpuhuff:hf2dec:done")

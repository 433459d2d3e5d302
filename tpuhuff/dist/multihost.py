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
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with env-var defaults; no-op when
    single-process or already initialized."""
    if jax.process_count() > 1:
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("TPUHUFF_COORDINATOR")
    if coordinator_address is None:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


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


def compress_file_multihost(
    src_path: str, dst_path: str, block_len: int = 65536
) -> None:
    """Config-5 orchestration: per-host streaming read of its own byte
    range, global-psum tree, device-parallel pack, host-0 ordered write of
    the ``.hf2`` container.

    Every process calls this with the same paths (SPMD); only process 0
    writes.  Degenerates to the single-host pipeline when run standalone.
    """
    import os

    from ..io.hff import write_hf2

    total = os.path.getsize(src_path)
    lo, hi = host_shard_range(total, block_len)
    with open(src_path, "rb") as fp:
        fp.seek(lo)
        local = np.frombuffer(fp.read(hi - lo), dtype=np.uint8)
    words, bits, tree, _ = compress_multihost(local, block_len=block_len)
    n_local_blocks = max(1, -(-local.size // block_len)) if local.size else 0
    bits = bits[:n_local_blocks]
    words = words[:n_local_blocks]
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        words = multihost_utils.process_allgather(words).reshape(-1, words.shape[-1])
        bits = multihost_utils.process_allgather(bits).reshape(-1)
    if is_coordinator():
        from . import stitch_words

        payload, _pad = stitch_words(words, bits)
        end_bits = np.cumsum(np.asarray(bits, dtype=np.uint64))
        with open(dst_path, "wb") as out:
            write_hf2(out, tree, total, block_len, end_bits, payload)


def compress_multihost(local_data: np.ndarray, block_len: int = 65536):
    """Compress this host's shard; returns (words, bits, tree, orig_len).

    The tree is identical on every host (global psum histogram), so host 0
    can stitch its own blocks' output with other hosts' via a gather of
    (words, bits) — see io.stream for the file path.  With one process this
    is exactly the local pipeline.
    """
    mesh = make_mesh()  # all addressable devices; with jax.distributed this
    # spans the full pod slice because jax.devices() is global
    return encode_pipeline(local_data, block_len=block_len, mesh=mesh)

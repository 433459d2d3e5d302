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

"""Device mesh helpers for block-parallel compression.

Compression has one natural parallel axis — independent input blocks — so
meshes here are 1-D (``"blocks"``).  The reference's analogues: the
12-thread histogram split (`weights.rs:293-319`) and the sequential block
loop (`huff/src/comp.rs:207-223`), SURVEY §2 parallelism table.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["BLOCK_AXIS", "make_mesh", "block_sharding", "replicated_sharding"]

BLOCK_AXIS = "blocks"


def make_mesh(devices: Optional[Sequence] = None, n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over ``devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BLOCK_AXIS,))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (block) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(BLOCK_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())

"""Histograms ("weights") over letters.

Capability match for `/root/reference/huff_coding/src/weights.rs`:

* ``build_weights_map``   — generic letter counting into a dict
  (`weights.rs:82-84,116-123`).  Python dicts are insertion-ordered, so unlike
  the reference's ``HashMap`` (random iteration ⇒ non-deterministic generic
  trees, see SURVEY §2), our generic trees are deterministic.
* ``ByteWeights``         — the fixed 256-bin byte histogram
  (`weights.rs:174-443`): distinct-count ``len``, ``+``/``+=`` merge
  (`weights.rs:222-235,374-388`), iteration in ascending byte order skipping
  zero bins (`weights.rs:396-442`).

The TPU-first redesign: counting is a vectorized ``numpy.bincount`` on host
(the reference's 12-thread ``threaded_from_bytes`` at `weights.rs:293-319` is
a data-parallel split+merge; bincount saturates host memory bandwidth without
threads) and a Pallas/XLA one-hot histogram on device
(:mod:`tpuhuff.kernels.histogram`), merged across chips with ``psum``.
"""

from __future__ import annotations

from typing import Dict, Hashable, Iterator, List, Sequence, Tuple, Union

import numpy as np

__all__ = ["ByteWeights", "build_weights_map", "weights_items"]

BytesLike = Union[bytes, bytearray, memoryview, np.ndarray]


def _as_u8_array(data: BytesLike) -> np.ndarray:
    if isinstance(data, np.ndarray):
        if data.dtype != np.uint8:
            raise TypeError(f"expected uint8 array, got {data.dtype}")
        return data.ravel()
    return np.frombuffer(bytes(data) if isinstance(data, memoryview) else data, dtype=np.uint8)


def build_weights_map(letters: Sequence[Hashable]) -> Dict[Hashable, int]:
    """Count letters into an (insertion-ordered) dict of letter -> weight.

    Mirrors `weights.rs:116-123`'s entry-or-insert loop; for uint8 arrays and
    bytes the count is vectorized.
    """
    if isinstance(letters, (bytes, bytearray, memoryview)) or (
        isinstance(letters, np.ndarray) and letters.dtype == np.uint8
    ):
        counts = np.bincount(_as_u8_array(letters), minlength=256)
        order = _first_occurrence_order(_as_u8_array(letters))
        return {int(b): int(counts[b]) for b in order}
    if isinstance(letters, np.ndarray):
        values, first_idx, counts = np.unique(
            letters, return_index=True, return_counts=True
        )
        order = np.argsort(first_idx, kind="stable")
        return {values[i].item(): int(counts[i]) for i in order}
    weights: Dict[Hashable, int] = {}
    for letter in letters:
        weights[letter] = weights.get(letter, 0) + 1
    return weights


def _first_occurrence_order(arr: np.ndarray) -> np.ndarray:
    """Byte values in order of first occurrence in ``arr``."""
    if arr.size == 0:
        return np.empty(0, dtype=np.int64)
    first = np.full(256, arr.size, dtype=np.int64)
    # reversed minimum-index trick: later writes win, so iterate reversed
    first[arr[::-1]] = np.arange(arr.size - 1, -1, -1)
    present = first < arr.size
    vals = np.nonzero(present)[0]
    return vals[np.argsort(first[vals], kind="stable")]


class ByteWeights:
    """256-bin byte histogram (reference ``ByteWeights``, `weights.rs:174-178`).

    Stores ``counts`` as an ``int64[256]`` numpy array plus the distinct-byte
    count ``len``.  Iteration yields ``(byte, weight)`` in ascending byte
    order, skipping zero-weight bins — the exact seed order the CLI tree build
    depends on (`weights.rs:423-442`, SURVEY §2 "Semantics").
    """

    __slots__ = ("counts",)

    def __init__(self, counts: np.ndarray | None = None):
        if counts is None:
            counts = np.zeros(256, dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
            if counts.shape != (256,):
                raise ValueError("counts must have shape (256,)")
            if (counts < 0).any():
                raise ValueError("counts must be non-negative")
        self.counts = counts

    # -- construction ------------------------------------------------------
    @classmethod
    def from_bytes(cls, data: BytesLike) -> "ByteWeights":
        """Count bytes (`weights.rs:265-279`): threaded C++ histogram when the
        native runtime is up (np.bincount casts u8→intp and crawls), else
        bincount."""
        arr = _as_u8_array(data)
        try:
            from .. import native

            if arr.size >= (1 << 16) and native.available():
                return cls(native.hist(arr))
        except Exception:
            pass
        return cls(np.bincount(arr, minlength=256).astype(np.int64))

    # `threaded_from_bytes` (`weights.rs:293-319`): with the native runtime
    # the thread count is honored (the reference CLI passes 12,
    # `huff/src/comp.rs:164`); without it a single bincount already runs at
    # memory bandwidth, and the real parallel path is the device histogram
    # kernel + psum merge.
    @classmethod
    def threaded_from_bytes(cls, data: BytesLike, thread_num: int = 12) -> "ByteWeights":
        arr = _as_u8_array(data)
        try:
            from .. import native

            if native.available():
                return cls(native.hist(arr, threads=max(1, int(thread_num))))
        except Exception:
            pass
        return cls(np.bincount(arr, minlength=256).astype(np.int64))

    # -- Weights interface (`weights.rs:34-39`) ----------------------------
    def get(self, byte: int) -> int | None:
        w = int(self.counts[byte])
        return w if w else None

    def __len__(self) -> int:
        return int(np.count_nonzero(self.counts))

    def is_empty(self) -> bool:
        return len(self) == 0

    def __iter__(self) -> Iterator[Tuple[int, int]]:
        for b in np.nonzero(self.counts)[0]:
            yield int(b), int(self.counts[b])

    def items(self) -> Iterator[Tuple[int, int]]:
        return iter(self)

    # -- merge (`weights.rs:222-235,374-388`) ------------------------------
    def add_byte_weights(self, other: "ByteWeights") -> None:
        self.counts += other.counts

    def __add__(self, other: "ByteWeights") -> "ByteWeights":
        return ByteWeights(self.counts + other.counts)

    def __iadd__(self, other: "ByteWeights") -> "ByteWeights":
        self.add_byte_weights(other)
        return self

    def __eq__(self, other: object) -> bool:
        return isinstance(other, ByteWeights) and bool(
            np.array_equal(self.counts, other.counts)
        )

    def __hash__(self) -> int:  # pragma: no cover - numpy-backed, rarely hashed
        return hash(self.counts.tobytes())

    def __repr__(self) -> str:
        return f"ByteWeights({dict(self)})"


def weights_items(weights) -> List[Tuple[Hashable, int]]:
    """Normalize any weights collection to an ordered ``[(letter, weight)]``.

    Accepts :class:`ByteWeights`, dicts, or any iterable of pairs — the
    analogue of consuming ``Weights::into_iter`` to seed the heap
    (`branch_heap.rs:52-58`).
    """
    if isinstance(weights, ByteWeights):
        return list(weights)
    if isinstance(weights, dict):
        return list(weights.items())
    return list(weights)

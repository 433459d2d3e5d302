"""Per-stage timing + device tracing (SURVEY §5 "Tracing / profiling").

The reference's only instrumentation is one wall-clock around the whole run
(`/root/reference/huff/src/cli.rs:133,160`).  Here every pipeline stage
(histogram / tree / pack / stitch / write) can record into a
:class:`StageTimer`, reported as a table with per-stage GB/s; and
:func:`device_trace` wraps a region in a ``jax.profiler`` trace for
XProf/TensorBoard when a trace directory is given.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

__all__ = ["StageTimer", "device_trace"]


@dataclass
class _Stage:
    seconds: float = 0.0
    bytes: int = 0
    calls: int = 0


@dataclass
class StageTimer:
    """Accumulates wall time and byte volume per named stage."""

    stages: Dict[str, _Stage] = field(default_factory=dict)
    order: List[str] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str, nbytes: int = 0) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stages.get(name)
            if s is None:
                s = self.stages[name] = _Stage()
                self.order.append(name)
            s.seconds += dt
            s.bytes += nbytes
            s.calls += 1

    def report(self) -> str:
        lines = [f"{'stage':<12} {'time':>9} {'bytes':>12} {'GB/s':>8} {'calls':>6}"]
        total = 0.0
        for name in self.order:
            s = self.stages[name]
            total += s.seconds
            gbps = s.bytes / s.seconds / 1e9 if s.seconds and s.bytes else 0.0
            lines.append(
                f"{name:<12} {s.seconds*1e3:8.1f}ms {s.bytes:>12} "
                f"{gbps:8.2f} {s.calls:>6}"
            )
        lines.append(f"{'total':<12} {total*1e3:8.1f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler.trace`` region when ``trace_dir`` is set, else no-op."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield

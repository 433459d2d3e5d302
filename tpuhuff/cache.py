"""Persistent XLA compilation cache.

This host compiles XLA programs client-side; cold compiles of the fused
encode/decode programs cost seconds to minutes (worse under CPU load —
BENCH_r01's 421 s first compile was host-CPU contention).  The persistent
cache makes every compile a one-time cost per machine: the CLI and
``bench.py`` both enable it, so repeat runs start in ~1 s.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".jax_cache")


def enable_compile_cache(path: str | None = None) -> None:
    """Idempotent; safe to call before or after backend init."""
    path = path or os.environ.get("TPUHUFF_COMPILE_CACHE", _DEFAULT)
    if path.lower() in ("0", "off", "none"):
        return
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax or read-only fs: cache is an optimization only

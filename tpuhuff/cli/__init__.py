"""``huff``-compatible command line (L5)."""

from .main import main, parse_block_size

__all__ = ["main", "parse_block_size"]

"""``python -m tpuhuff`` — the huff-compatible CLI."""

import sys

from .cli.main import main

sys.exit(main())

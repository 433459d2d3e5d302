"""``python -m tpuhuff.cli`` — same entry as ``python -m tpuhuff``."""

import sys

from .main import main

sys.exit(main())

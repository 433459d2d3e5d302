"""Test config: repo-root imports + 8 virtual CPU devices for mesh tests.

Per SURVEY §4: the JAX CPU backend with
``--xla_force_host_platform_device_count=8`` is the "fake multi-device
backend" — multi-chip sharding tests run on it deterministically; the real
chip is exercised by ``bench.py``.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

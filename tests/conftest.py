"""Test config: repo-root imports + 8 virtual CPU devices for mesh tests.

Per SURVEY §4: the JAX CPU backend with
``--xla_force_host_platform_device_count=8`` is the "fake multi-device
backend" — multi-chip sharding tests run on it deterministically; the real
chip is exercised by ``bench.py``.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force the CPU backend for determinism and the virtual 8-device mesh, even
# when the ambient environment points JAX at a TPU tunnel.  The tunnel's
# sitecustomize imports jax at interpreter startup, so env vars are too late
# here — use the config API.  Set TPUHUFF_TEST_TPU=1 to run on real devices.
if os.environ.get("TPUHUFF_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except ImportError:
        pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

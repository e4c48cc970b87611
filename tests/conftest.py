"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Tests exercise the same jitted code paths that run on TPU; multi-chip
sharding tests use the 8 virtual CPU devices as a stand-in mesh.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

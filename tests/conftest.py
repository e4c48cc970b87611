"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Tests exercise the same jitted code paths that run on TPU; multi-chip
sharding tests use the 8 virtual CPU devices as a stand-in mesh.

The hardware lane (``pytest -m tpu``, driven by tools/tpu_smoke.py or
``LDPC_TPU_TESTS=1``) lifts the CPU pin so ``@pytest.mark.tpu`` tests run
on the real chip; those tests skip themselves on CPU.

Note: the environment's sitecustomize registers the ``axon`` TPU backend
and overrides ``JAX_PLATFORMS``, so we must force CPU through
``jax.config`` (which wins over the plugin) before any computation runs.
"""

import os
import sys

_TPU_LANE = os.environ.get("LDPC_TPU_TESTS", "") == "1"

_flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_LANE and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
# enable the f64 exact-parity mode used by the golden reference tests;
# decoders still default to f32 (the TPU perf path) unless dtype is passed.
# The hardware lane keeps x64 off: TPUs have no f64 ALU, and weak-typed
# float64 host arrays would poison the f32 programs under test.
if not _TPU_LANE:
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

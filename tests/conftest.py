"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Parity targets (<1e-9 in phase/DM, BASELINE.md) require x64; multi-chip
sharding tests run on the virtual CPU mesh per SURVEY.md section 7.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU backend and forces
# jax_platforms; override it after import (backends initialize lazily).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

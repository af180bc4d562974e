"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Tests validate numerics in float64 on CPU (the TPU path runs float32; the
SHT/solver code is dtype-polymorphic).  Multi-device sharding tests use the
8 virtual CPU devices as a stand-in for a TPU pod slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

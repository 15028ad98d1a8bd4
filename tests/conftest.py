"""Hermetic test setup: 8 virtual CPU devices, no network, tiny models.

Multi-device sharding tests run on an emulated CPU mesh
(``--xla_force_host_platform_device_count=8``); real-TPU benchmarks live in
bench.py, not tests.
"""

import os

# Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

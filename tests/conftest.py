"""Hermetic test setup: 8 virtual CPU devices, no network, tiny models.

Multi-device sharding tests run on an emulated CPU mesh
(``--xla_force_host_platform_device_count=8``); real-TPU benchmarks live in
bench.py, not tests.
"""

import os

# Must be set before jax import. FORCE cpu: the surrounding environment may
# export JAX_PLATFORMS=<tpu plugin>, and unit tests must not ride a TPU
# tunnel (slow, single-tenant, and wedges under concurrent test runs).
os.environ["JAX_PLATFORMS"] = "cpu"
# Run Pallas kernels through the generic interpreter on CPU (numerics only;
# the mosaic TPU interpreter is far too slow for CI).
os.environ.setdefault("FLASH_TPU_PALLAS_INTERPRET", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize pre-imports jax and registers a TPU plugin
# backend, so the env var alone is not enough — override the resolved
# platform too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Exact fp32 matmuls on CPU (JAX's default rounds inputs to bf16, TPU-MXU
# style); Pallas-kernel-vs-XLA comparisons still use loose tolerances since
# kernels keep default (bf16-input) precision by design.
jax.config.update("jax_default_matmul_precision", "highest")

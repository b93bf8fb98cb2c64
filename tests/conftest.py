"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware and kernels stay deterministic (the axon TPU plugin
overrides JAX_PLATFORMS env vars, so we must use jax.config)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

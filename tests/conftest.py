"""Test configuration: force an 8-virtual-device CPU platform.

Multi-device correctness is tested the way the reference never could
(SURVEY §4): a single-host mesh of 8 emulated devices via
``xla_force_host_platform_device_count``, so sims-axis sharding and its
collectives compile+execute without TPU hardware.

Note: this environment's sitecustomize pins ``JAX_PLATFORMS=axon`` (TPU
tunnel) at interpreter startup, so the env var alone is not enough — the
platform must also be forced through ``jax.config``.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

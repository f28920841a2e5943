"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths (all-gather contrastive loss, sharded decode)
are exercised without TPU hardware.

Note: this host presets JAX_PLATFORMS=axon (a tunnelled TPU chip) and the
env var route does not stick — use jax.config explicitly.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

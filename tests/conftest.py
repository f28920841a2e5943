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

# The suite's wall time is dominated by XLA:CPU compiles (a cold run is
# ~22 min, <2 min of it actual math). Persist them in the host-keyed
# CPU cache dir (see lavila_tpu/utils/compile_cache.py for why a plain
# shared dir would SIGILL on the next host generation).
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from lavila_tpu.utils import compile_cache  # noqa: E402

_REPO_ROOT = os.path.join(os.path.dirname(__file__), os.pardir)


def _use_suite_cache():
    compile_cache.use_cpu_cache(_REPO_ROOT, min_compile_secs=0.0)


_use_suite_cache()

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _suite_compile_cache():
    # Re-assert AFTER collection: test_bench_retry imports bench.py at
    # collection time, whose import resets the cache dir to the TPU one
    # with a 1.0s compile-time floor — silently disabling suite caching.
    _use_suite_cache()

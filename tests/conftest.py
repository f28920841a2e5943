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
# ~22 min, <2 min of it actual math). Persist them. The cache dir is
# keyed by the host's CPU feature flags: XLA:CPU AOT results bake in ISA
# features (avx512/amx/...), and loading an entry compiled on a
# different machine can SIGILL — a plain shared dir would poison runs
# on the next host generation.
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as f:
        _cpu = next((ln for ln in f if ln.startswith("flags")), "")
except OSError:  # pragma: no cover - non-Linux fallback
    _cpu = ""
_tag = hashlib.md5((_cpu or os.uname().machine).encode()).hexdigest()[:10]
_CPU_CACHE_DIR = os.path.join(
    os.path.dirname(__file__), os.pardir, ".jax_cache", "cpu-" + _tag)


def _use_suite_cache():
    jax.config.update("jax_compilation_cache_dir", _CPU_CACHE_DIR)
    # 0.0, not the usual 0.5+: the suite's compile time is hundreds of
    # SMALL executables per test (tiny oracles, eager dispatches), none
    # individually over ~0.2s — a floor would cache nothing.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_use_suite_cache()

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _suite_compile_cache():
    # Re-assert AFTER collection: test_bench_retry imports bench.py at
    # collection time, whose import resets the cache dir to the TPU one
    # with a 1.0s compile-time floor — silently disabling suite caching.
    _use_suite_cache()

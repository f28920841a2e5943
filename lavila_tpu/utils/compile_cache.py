"""Host-keyed persistent compilation cache for XLA:CPU runs.

XLA:CPU AOT results bake in ISA features (avx512/amx/...), and jax's
persistent-cache key does NOT include them — loading an entry compiled
on a different machine can SIGILL. Anything that compiles on the CPU
backend against a shared cache dir (the test suite, the driver's
``dryrun_multichip``) must therefore key the dir by the host's CPU
feature flags. TPU entries don't need this (the compile target is in
the key), so ``bench.py`` keeps the plain shared dir.

ORDERING: call :func:`use_cpu_cache` BEFORE the backend initializes
(before any ``jax.devices()`` / first dispatch). jax pins the
persistent cache's directory at first use; ``jax.config.update`` after
that point is silently ignored (verified empirically — entries keep
landing in the first-used dir).

KNOWN NOISE: ``cpu_aot_loader`` E-logs about ``+prefer-no-scatter /
+prefer-no-gather`` "not supported on the host machine" are a
SAME-HOST false positive in this jaxlib: XLA compiles with LLVM
*tuning* features that the loader's host-feature probe never reports
(verified by purging every cache dir and reloading entries written
minutes earlier by the same process's host). They are cosmetic; only
mismatches in real ISA features (avx512/amx/...) matter, and those are
what the host key below prevents.
"""

import hashlib
import os

import jax


def host_cpu_tag() -> str:
    """Short stable tag for this host's CPU identity.

    Hashes vendor/family/model/stepping AND the feature flags: LLVM's
    per-microarch tuning is keyed off family/model, which can differ
    across host generations whose virtualized ``flags`` line is
    identical. (The ``prefer-no-*`` loader warnings that motivated an
    earlier strengthening turned out to be a same-host false positive —
    see the module docstring — but family/model keying stays: it is the
    input to LLVM codegen tuning and costs nothing.)"""
    keys = ("vendor_id", "cpu family", "model", "model name", "stepping",
            "flags")
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if not ln.strip():  # end of the first processor block
                    break
                if ln.split(":")[0].strip() in keys:
                    ident.append(ln.strip())
    except OSError:  # pragma: no cover - non-Linux fallback
        pass
    blob = "\n".join(ident) or os.uname().machine
    return hashlib.md5(blob.encode()).hexdigest()[:10]


def cpu_cache_dir(root: str) -> str:
    """``<root>/.jax_cache/cpu-<host-tag>`` for CPU-backend compiles."""
    return os.path.join(root, ".jax_cache", "cpu-" + host_cpu_tag())


def use_cpu_cache(root: str, min_compile_secs: float = 0.0) -> str:
    """Point jax's persistent cache at the host-keyed CPU dir.

    ``min_compile_secs`` defaults to 0.0 (not jax's usual 1.0+): the
    test suite's compile time is hundreds of SMALL executables (tiny
    oracles, eager dispatches), none individually over ~0.2 s — a floor
    would cache nothing.
    """
    path = cpu_cache_dir(root)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path

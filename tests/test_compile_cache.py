"""Host-keyed XLA:CPU persistent-cache helper (utils/compile_cache.py).

The tag must be stable within a host and derived from CPU identity
(family/model/stepping + feature flags); the dir helper must place CPU
caches under <root>/.jax_cache/cpu-<tag> so entries compiled on a
different host generation can never be loaded here (XLA:CPU AOT bakes
in ISA features; a cross-host load can SIGILL).
"""

import jax

from lavila_tpu.utils import compile_cache


def test_tag_is_stable_and_short():
    t1 = compile_cache.host_cpu_tag()
    t2 = compile_cache.host_cpu_tag()
    assert t1 == t2
    assert len(t1) == 10
    assert all(c in "0123456789abcdef" for c in t1)


def test_cpu_cache_dir_layout(tmp_path):
    d = compile_cache.cpu_cache_dir(str(tmp_path))
    assert d == str(tmp_path / ".jax_cache" /
                    ("cpu-" + compile_cache.host_cpu_tag()))


def test_use_cpu_cache_sets_config(tmp_path):
    # conftest already pointed the config at the repo cache; flip to a
    # scratch root and verify, then restore (the persistent cache is
    # pinned at first use, so flipping the CONFIG here does not move
    # the suite's live cache — see the module docstring).
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        path = compile_cache.use_cpu_cache(str(tmp_path),
                                           min_compile_secs=0.25)
        assert path == compile_cache.cpu_cache_dir(str(tmp_path))
        assert jax.config.jax_compilation_cache_dir == path
        assert (jax.config.jax_persistent_cache_min_compile_time_secs
                == 0.25)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)

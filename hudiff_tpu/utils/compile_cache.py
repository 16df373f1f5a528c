"""Shared persistent XLA compile-cache setup.

One place for the cache location and threshold, used by the test suite
(tests/conftest.py), the multihost worker processes (which must share the
suite's cache to skip re-compiling identical programs), and the driver's
multichip dryrun (__graft_entry__).
"""
from __future__ import annotations

import os

CACHE_ENV = 'HUDIFF_JAX_CACHE'
DEFAULT_CACHE_DIR = '/tmp/hudiff_jax_cache'
MIN_COMPILE_SECS = 2.0


def enable_compile_cache() -> str:
    """Point JAX's persistent compilation cache at the shared directory.

    Call before the first compilation. Returns the cache dir in use."""
    import jax
    cache_dir = os.environ.get(CACHE_ENV, DEFAULT_CACHE_DIR)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      MIN_COMPILE_SECS)
    return cache_dir

"""Persistent XLA compile cache setup (shared by cli.py and bench.py).

The classify program is large; first compile is minutes on some PJRT
backends (171 s measured for the w=8 bench program on the axon tunnel,
round 2). Round 2's driver bench TIMED OUT (BENCH_r02.json rc=124) partly
because bench.py never enabled this cache — every driver run paid full
compile. Both entry points now call :func:`enable_compile_cache` before
first backend use.
"""
from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Point JAX at a persistent on-disk compile cache. Returns the cache
    dir, or None when disabled via JAX_COMPILATION_CACHE_DIR=0."""
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/pangea_tpu/jax_cache"))
    if cache == "0":
        return None
    import jax
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache

"""Persistent XLA compilation cache setup.

First compiles through this environment's remote TPU compiler take minutes;
the persistent cache cuts warm starts to seconds.  Call before the first
jitted computation.  Opt-in (scripts and bench enable it; importing the
library does not change global config).
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get("ODAM_COMPILE_CACHE", DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir

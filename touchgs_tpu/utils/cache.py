"""Persistent XLA compilation cache.

Remote TPU compiles in this environment are high-variance (the same train
step program has been observed to compile in 25 s or 15+ min on the tunnel's
AOT service); caching serialized executables on local disk makes every run
after the first fast.  Call early, before the first jit execution.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/touchgs_jax") -> str:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took noticeable compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path

"""Persistent XLA compilation cache.

The DiT step and the rasterizers take minutes to compile at production
shapes; every CLI/bench/serving process pays that again without a persistent
cache. Call enable_persistent_cache() early (the CLIs, bench.py and the
servers do).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "VERSECRAFTER_JAX_CACHE", os.path.expanduser("~/.cache/versecrafter_jax"))


def enable_persistent_cache(path: str = DEFAULT_DIR) -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass

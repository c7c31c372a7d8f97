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
        # cache EVERYTHING: over the axon tunnel even a 0.4 s eager-op
        # compile is a full remote round trip, and a process dispatches
        # dozens of them before the big programs (measured: the 2 s floor
        # left ~1 min of repeat-run compiles on the table)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # threefry call-sites compile pathologically slowly through the axon
        # AOT helper (measured: umT5-xxl random init 240-570 s vs 12 s with
        # the hardware rbg generator). Entry points only ever use RNG for
        # random-init smoke models and noise seeds — rbg is deterministic
        # per seed, which is all they need. Tests (which pin exact values on
        # CPU) don't call this hook and keep the default threefry.
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass

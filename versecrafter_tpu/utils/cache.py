"""Entry-point runtime setup (persistent XLA compile cache + fast RNG).

The DiT step and the rasterizers take minutes to compile at production
shapes; every CLI/bench/serving process pays that again without a persistent
cache. Call setup_runtime() early (the CLIs, bench.py and the servers do;
enable_persistent_cache remains as a compatibility alias).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "VERSECRAFTER_JAX_CACHE", os.path.expanduser("~/.cache/versecrafter_jax"))


def setup_runtime(path: str = DEFAULT_DIR, fast_rng: bool = True) -> None:
    """Entry-point runtime setup: persistent compile cache + fast RNG.

    fast_rng=True switches the process-global default PRNG to `rbg`:
    threefry call-sites compile pathologically slowly through the axon
    remote AOT helper (measured: umT5-xxl random init 240-570 s vs 12 s
    with rbg). This CHANGES the values drawn for a given seed (still
    deterministic per seed within an environment, which is all the
    random-init smoke models and noise seeds need; real runs load converted
    weights). Pass fast_rng=False or set VERSECRAFTER_THREEFRY=1 to keep
    the jax default — tests don't call this hook and always keep threefry.
    """
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
        if fast_rng and not os.environ.get("VERSECRAFTER_THREEFRY"):
            jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass


# Backwards-compatible alias. The RNG switch made the old name misleading
# (ADVICE r2): a "cache" helper that changes seed semantics; setup_runtime
# says what it does.
enable_persistent_cache = setup_runtime
